"""A/B XLA compiler options on the bench train step (real TPU).

The machine-level XLA_FLAGS env is parsed by the LOCAL (CPU) XLA too, which
rejects TPU-only flags — so TPU options must be passed per-compile via
``.lower().compile(compiler_options=...)``. Usage:

    python tools/xla_flag_ab.py                      # baseline, no options
    python tools/xla_flag_ab.py xla_tpu_scoped_vmem_limit_kib=65536

Same honest methodology as bench.py (scanned multi-step + blocking loss
readback).
"""

import json
import os
import sys
import time

import numpy as np

# runnable as `python tools/xla_flag_ab.py` without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    opts = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        opts[k] = v

    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_scan_train_step,
    )

    batch, inner = 128, 64
    cfg = ConvFlowConfig(
        io_shape=(28, 28, 2), x_d=1, squeeze_factor_blocks=(0, 1, 0, 0),
        res_blocks=(3, 3, 3, 3), num_kernels=(64, 64, 32, 32),
        cardinality=(8, 8, 4, 4), ksize=3, fused_subnet=True,
        compute_dtype="bfloat16",
    )
    model = ConvCFlow(cfg)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.normal(size=(inner, batch) + cfg.io_shape), jnp.float32)
    state = create_train_state(model, xy[0, :1], learning_rate=3e-4)
    multi = make_scan_train_step(model, num_inner=inner, noise_mode="none")
    key = jax.random.PRNGKey(0)
    alpha = jnp.float32(1.0)

    t0 = time.perf_counter()
    # make_scan_train_step returns a jitted (donating) fn; lower it with the
    # requested per-compile options
    lowered = multi.lower(state, xy, key, alpha)
    compiled = lowered.compile(compiler_options=opts or None)
    compile_s = time.perf_counter() - t0

    state, out = compiled(state, xy, key, alpha)
    print("first loss:", float(out["loss"]), file=sys.stderr)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, out = compiled(state, xy, key, alpha)
        _ = float(out["loss"])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "options": opts,
        "compile_s": round(compile_s, 1),
        "step_ms": round(med / inner * 1e3, 3),
        "train_sps": round(batch * inner / med, 1),
    }))


if __name__ == "__main__":
    main()
