"""Architecture-space fuzz harness (out-of-suite, CPU).

Samples random VALID configurations far beyond the in-suite fuzz budget and
checks the full bijectivity contract on each:

- round-trip exactness ``inverse(forward(x)) == x``,
- per-sample log-det finiteness and shape,
- log-det vs ``slogdet(jacfwd)`` on the smallest shapes,
- (toy) joint-NLL finiteness.

This is the harness that found the ksize=1 dilation-schedule
ZeroDivisionError (models/arch.py). Run both spaces before a release:

    python tools/fuzz_arch.py conv --seed 99 --n 40
    python tools/fuzz_arch.py toy  --seed 7  --n 30

Exit code 1 on any failure; each failing config is printed in full so it can
be turned into a regression test (cf. SURVEY.md §4 — the reference has no
test suite; property fuzzing is part of this framework's replacement).
"""

import argparse
import os
import random as pyrandom
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS is ignored here
import jax.numpy as jnp
import numpy as np


def fuzz_conv(seed: int, n: int) -> int:
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )

    r = pyrandom.Random(seed)
    rng = np.random.default_rng(seed)
    tried = failures = 0
    for it in range(n * 4):
        if tried >= n:
            break
        nb = r.choice([1, 2, 3, 4])
        side = r.choice([4, 8, 12, 16, 20])
        sf = tuple(r.choice([0, 1]) for _ in range(nb))
        if side % (2 ** (sum(sf) + 1)):
            continue
        ks = tuple(r.choice([4, 8, 12, 16]) for _ in range(nb))
        card = tuple(r.choice([2, 4]) for _ in range(nb))
        if any(k % c for k, c in zip(ks, card)):
            continue
        xy_d = r.choice([2, 3, 4, 5])
        cfg = ConvFlowConfig(
            io_shape=(side, side, xy_d),
            x_d=r.choice([1, max(1, xy_d - 1)]),
            squeeze_factor_blocks=sf,
            res_blocks=tuple(r.choice([1, 2]) for _ in range(nb)),
            num_kernels=ks,
            cardinality=card,
            ksize=r.choice([1, 3]),
            layer_norm=r.choice([False, True]),
            fused_subnet=r.choice([False, True]),
            # alternative lowerings / compat modes must preserve bijectivity
            experimental_lowering=r.choice(
                [None, None, "dense_groups", "fused_dilated"]
            ),
            ref_compat_group_slice=r.choice([False, False, True]),
        )
        try:
            model = ConvCFlow(cfg)
            params = model.init(
                jax.random.PRNGKey(seed + it), jnp.zeros((2,) + cfg.io_shape)
            )
        except AssertionError:
            continue  # invalid combo rejected by config validation — fine
        tried += 1
        xy = jnp.asarray(rng.normal(size=(3,) + cfg.io_shape).astype(np.float32))
        zy, log_det = model.apply(params, xy)
        ok = bool(np.all(np.isfinite(np.asarray(log_det)))) and log_det.shape == (3,)
        if not ok:
            print(f"[{tried}] BAD log_det {cfg}", flush=True)
        back = model.apply(params, zy, method="inverse")
        err = float(np.max(np.abs(np.asarray(back) - np.asarray(xy))))
        if err > 3e-4:
            ok = False
            print(f"[{tried}] ROUNDTRIP err={err:.2e} {cfg}", flush=True)
        if side == 4 and tried % 3 == 0:  # autodiff cross-check, tiny only

            def f_single(x):
                z, _ = model.apply(params, x[None])
                return z[0].reshape(-1)

            J = jax.jacfwd(f_single)(xy[0]).reshape(side * side * xy_d, -1)
            _, ref_ld = np.linalg.slogdet(np.asarray(J))
            if abs(float(log_det[0]) - float(ref_ld)) > 1e-2 * max(
                1.0, abs(float(ref_ld))
            ):
                ok = False
                print(
                    f"[{tried}] LOGDET ours={float(log_det[0]):.4f} "
                    f"ref={float(ref_ld):.4f} {cfg}",
                    flush=True,
                )
        failures += 0 if ok else 1
        print(
            f"[{tried}/{n}] ok={ok} side={side} nb={nb} xy_d={xy_d} "
            f"ks={cfg.ksize} err={err:.1e}",
            flush=True,
        )
    print(f"DONE tried={tried} failures={failures}")
    return failures


def fuzz_toy(seed: int, n: int) -> int:
    from arl_conditional_normalizing_flows_tpu.models import (
        ToyCINN,
        ToyConfig,
        shuffle_mask_indices,
    )

    r = pyrandom.Random(seed)
    rng = np.random.default_rng(seed)
    failures = 0
    for it in range(n):
        nl = 6 * r.choice([1, 2, 3, 4])
        cfg = ToyConfig(
            num_coupling_layers=nl,
            intermediate_dims=r.choice([4, 8, 16]),
            num_layers=r.choice([1, 2, 4]),
            mask_indices=tuple(
                shuffle_mask_indices(np.random.default_rng(seed + it), nl)
            ),
        )
        model = ToyCINN(cfg)
        params = model.init(jax.random.PRNGKey(seed + it), jnp.zeros((2, 3)))
        xy = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        zy, log_det = model.apply(params, xy)
        ok = bool(np.all(np.isfinite(np.asarray(log_det)))) and log_det.shape == (4,)
        back = model.apply(params, zy, method="inverse")
        err = float(np.max(np.abs(np.asarray(back) - np.asarray(xy))))
        # scale-aware: deep random-init stacks amplify |zy| to ~1e2, and f32
        # round-trip error grows with it (measured: a 24-layer stack with
        # max|zy|=83 round-trips to 2.8e-4 in f32 but 3e-13 in f64 — pure
        # conditioning, not a logic bug)
        tol = 1e-5 * max(1.0, float(np.max(np.abs(np.asarray(zy)))))
        if err > tol:
            ok = False
            print(f"[{it}] ROUNDTRIP err={err:.2e} tol={tol:.1e} {cfg}", flush=True)

        def f_single(x):
            z, _ = model.apply(params, x[None])
            return z[0]

        _, ref_ld = np.linalg.slogdet(np.asarray(jax.jacfwd(f_single)(xy[0])))
        if abs(float(log_det[0]) - float(ref_ld)) > 1e-3 * max(
            1.0, abs(float(ref_ld))
        ):
            ok = False
            print(
                f"[{it}] LOGDET ours={float(log_det[0]):.5f} "
                f"ref={float(ref_ld):.5f} {cfg}",
                flush=True,
            )
        if not np.isfinite(float(model.apply(params, xy, method="log_loss")["loss"])):
            ok = False
            print(f"[{it}] LOSS nonfinite {cfg}", flush=True)
        failures += 0 if ok else 1
        print(f"[{it + 1}/{n}] ok={ok} layers={nl} err={err:.1e}", flush=True)
    print(f"DONE failures={failures}")
    return failures


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("space", choices=["conv", "toy"])
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--n", type=int, default=40, help="valid configs to try")
    args = p.parse_args()
    failures = (fuzz_conv if args.space == "conv" else fuzz_toy)(args.seed, args.n)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
