"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: training-step throughput (samples/s) of the flagship conv
cINN (the reference's default 28x28 arch, conv_cINN.py:56-65) on the current
accelerator.  ``vs_baseline`` compares against the value stored in
``BENCH_BASELINE.json`` (written the first time the bench runs on a given
platform), so the driver sees relative progress across rounds.

Extra detail (sampling throughput, per-step latency) goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def _bench(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    # batch 2048 is the sweet spot on one v5e chip: per-step wall time is
    # latency-floored (~5-6 ms through the tunnel) up to this size, so
    # throughput scales ~linearly; >=4096 exceeds the remote compiler.
    batch = int(os.environ.get("BENCH_BATCH", 2048))
    if os.environ.get("BENCH_ARCH") == "small":  # fast validation arch
        arch = dict(io_shape=(8, 8, 2), squeeze_factor_blocks=(0, 1),
                    res_blocks=(1, 1), num_kernels=(16, 16), cardinality=(2, 2))
    else:
        arch = dict(io_shape=(28, 28, 2), squeeze_factor_blocks=(0, 1, 0, 0),
                    res_blocks=(3, 3, 3, 3), num_kernels=(64, 64, 32, 32),
                    cardinality=(8, 8, 4, 4))
    cfg = ConvFlowConfig(
        x_d=1,
        ksize=3,
        fused_subnet=os.environ.get("BENCH_FUSED", "1") == "1",
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        **arch,
    )
    model = ConvCFlow(cfg)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.normal(size=(batch,) + cfg.io_shape), jnp.float32)
    state = create_train_state(model, xy[:1], learning_rate=3e-4)
    train_step, _ = make_step_fns(model)
    key = jax.random.PRNGKey(0)
    alpha = jnp.float32(1.0)

    def step(state, xy):
        return train_step(state, xy, key, alpha)

    # keep state fixed across iters (donated arg: rebuild closure per call)
    t_compile0 = time.perf_counter()
    state2, out = step(state, xy)
    jax.block_until_ready(out["loss"])
    compile_s = time.perf_counter() - t_compile0

    def run(xy):
        nonlocal state2
        state2, out = train_step(state2, xy, key, alpha)
        return out["loss"]

    dt = _bench(run, xy, warmup=3, iters=20)
    train_sps = batch / dt

    # sampling throughput
    sample_fn = jax.jit(
        lambda params, z, y: model.apply(params, z, y, method="sample_xy")
    )
    hh, ww, _ = cfg.io_shape
    z = jnp.asarray(rng.normal(size=(batch, hh, ww, 1)), jnp.float32)
    y = jnp.ones((batch, hh, ww, 1), jnp.float32) * 0.5
    dt_s = _bench(lambda: sample_fn(state2.params, z, y), warmup=2, iters=20)
    sample_sps = batch / dt_s

    # multi-chip: report DP-sharded throughput too when a mesh is available
    dp = None
    if len(jax.devices()) > 1:
        try:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            n = len(jax.devices())
            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            dp_step, _ = make_step_fns(model, mesh=mesh)
            repl = NamedSharding(mesh, P())
            state_dp = jax.device_put(state2, repl)
            xy_dp = jax.device_put(xy, NamedSharding(mesh, P("data")))
            key_dp = jax.device_put(key, repl)

            def run_dp(xy_dp):
                nonlocal state_dp
                state_dp, out = dp_step(state_dp, xy_dp, key_dp, alpha)
                return out["loss"]

            dt_dp = _bench(run_dp, xy_dp, warmup=3, iters=20)
            dp = {
                "devices": n,
                "train_samples_per_sec": round(batch / dt_dp, 1),
                "scaling_efficiency": round((batch / dt_dp) / (train_sps * n), 3),
            }
        except Exception as e:  # never let the multi-chip path break the bench
            dp = {"error": str(e)[:200]}

    platform = jax.devices()[0].platform
    detail = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "batch": batch,
        "compile_seconds": round(compile_s, 2),
        "train_step_ms": round(dt * 1e3, 3),
        "train_samples_per_sec": round(train_sps, 1),
        "sample_step_ms": round(dt_s * 1e3, 3),
        "samples_per_sec": round(sample_sps, 1),
        "dtype": cfg.compute_dtype,
        "fused_subnet": cfg.fused_subnet,
        "data_parallel": dp,
    }
    print(json.dumps(detail), file=sys.stderr)

    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            stored = json.load(f)
        baseline = stored.get(platform)
    if baseline is None:
        stored = {}
        if os.path.exists(base_path):
            with open(base_path) as f:
                stored = json.load(f)
        stored[platform] = train_sps
        with open(base_path, "w") as f:
            json.dump(stored, f)
        baseline = train_sps

    print(
        json.dumps(
            {
                "metric": "conv_cinn_train_throughput",
                "value": round(train_sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(train_sps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
