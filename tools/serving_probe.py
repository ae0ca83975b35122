"""Serving-throughput probe: where does per-call time go, and how far can
multi-draw batching + uint8 payloads push samples/s per call?

Sweeps draws-per-call (D) for the multidraw artifact in float32 and
uint8-quantized output modes on the flagship arch, timing END-TO-END calls
(dispatch + device + full host readback, median of 3) under whatever host
load exists. Writes benchmarks/results/serving_probe.json.

Usage: python tools/serving_probe.py [--batch 128] [--draws 4 16 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "benchmarks", "results")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--draws", type=int, nargs="*", default=[4, 16, 64])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.serve import (
        export_multidraw_sampler,
        make_image_serving_fn,
    )

    cfg = ConvFlowConfig(
        io_shape=(28, 28, 2), x_d=1, squeeze_factor_blocks=(0, 1, 0, 0),
        res_blocks=(3, 3, 3, 3), num_kernels=(64, 64, 32, 32),
        cardinality=(8, 8, 4, 4), ksize=3, fused_subnet=True,
        compute_dtype="bfloat16",
    )
    model = ConvCFlow(cfg)
    rng = np.random.default_rng(0)
    xy0 = jnp.zeros((1, 28, 28, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xy0)
    y = jnp.full((args.batch, 28, 28, 1), 0.5, jnp.float32)

    from arl_conditional_normalizing_flows_tpu.serve import (
        export_seeded_multidraw_sampler,
    )

    report = {"batch": args.batch, "device": str(jax.devices()[0]), "modes": {}}
    for mode in ("float32", "uint8", "seeded_uint8"):
        fn = make_image_serving_fn(
            model, params, cfg.x_d, de_logit=True,
            quantize_uint8=mode.endswith("uint8"),
        )
        rows = []
        if mode == "seeded_uint8":
            # device-side latent draw: the host sends ONE int32 seed
            for d in args.draws:
                exported = export_seeded_multidraw_sampler(
                    fn, d, (28, 28, 1), (28, 28, 1)
                )
                seed = jnp.int32(7)
                out = np.asarray(exported.call(seed, y))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = np.asarray(exported.call(seed, y))
                    times.append(time.perf_counter() - t0)
                med = sorted(times)[1]
                rows.append({
                    "draws": d,
                    "samples_per_call": d * args.batch,
                    "call_ms": round(med * 1e3, 1),
                    "samples_per_sec": round(d * args.batch / med, 1),
                    "payload_mb": round(out.nbytes / 1e6, 2),
                    "upload_mb": 0.0,
                })
                print(f"{mode} D={d}: {rows[-1]}", flush=True)
        else:
            exported = export_multidraw_sampler(fn, (28, 28, 1), (28, 28, 1))
            for d in args.draws:
                # HOST-resident z: a real serving request uploads fresh
                # latents every call, so the upload belongs in the timing
                z = rng.normal(
                    size=(d, args.batch, 28, 28, 1)
                ).astype(np.float32)
                out = np.asarray(exported.call(z, y))  # compile per shape
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = np.asarray(exported.call(z, y))
                    times.append(time.perf_counter() - t0)
                med = sorted(times)[1]
                rows.append({
                    "draws": d,
                    "samples_per_call": d * args.batch,
                    "call_ms": round(med * 1e3, 1),
                    "samples_per_sec": round(d * args.batch / med, 1),
                    "payload_mb": round(out.nbytes / 1e6, 2),
                    "upload_mb": round(z.size * 4 / 1e6, 2),
                })
                print(f"{mode} D={d}: {rows[-1]}", flush=True)
        report["modes"][mode] = rows

    # pipelined serving: N worker threads keep calls in flight so transport
    # (dispatch + readback) overlaps device compute — steady-state
    # throughput approaches max(transport, compute) instead of their sum.
    # Measured r3: saturates at 6-8 threads around 27.5k sps = ~53% of the
    # 51.7k device-side rate, CLEARING the >=50% serving bar that single
    # calls cannot reach through this tunnel.
    import threading

    fn = make_image_serving_fn(
        model, params, cfg.x_d, de_logit=True, quantize_uint8=True
    )
    d = 16
    exported = export_seeded_multidraw_sampler(fn, d, (28, 28, 1), (28, 28, 1))
    np.asarray(exported.call(jnp.int32(0), y))  # compile

    def run_pipelined(n_threads, n_calls):
        done = [0]
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    if done[0] >= n_calls:
                        return
                    seed = done[0]
                    done[0] += 1
                np.asarray(exported.call(jnp.int32(seed), y))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        return {
            "threads": n_threads,
            "calls": n_calls,
            "samples_per_sec": round(n_calls * d * args.batch / wall, 1),
            "wall_s": round(wall, 2),
        }

    report["pipelined"] = {
        "mode": "seeded_uint8",
        "draws": d,
        "sweep": [run_pipelined(n, 12 if n <= 4 else 24) for n in (1, 2, 4, 8)],
    }
    print(f"pipelined: {report['pipelined']}", flush=True)

    print(json.dumps(report, indent=2))
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "serving_probe.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
