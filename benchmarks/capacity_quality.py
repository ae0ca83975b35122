"""Capacity-preset quality demo (VERDICT r4 stretch #8).

The 128-lane capacity preset (``models.arch.perf_arch_config``) existed
only as a bench configuration (MFU 15.5%, sampling 91.9% of roofline —
docs/PERF_NOTES.md). This harness turns "the arch is the lever" into a
measured quality claim: train the reference-parity flagship arch and the
capacity preset on the IDENTICAL class workload stream for the SAME
wall-clock budget (each arch gets through however many epochs it can),
evaluating held-out val bits/dim every 10 epochs on the byte-identical
fixed val set (flagship_split.py genval).

bits/dim convention matches drivers/conv.py:407-420: x-NLL in the
noise-floored logit space (val_z + val_detJ) / (ln2 * 28*28) — the parity
metric, not a literature-comparable discrete bits/dim.

Run (real TPU):  python benchmarks/capacity_quality.py [budget_seconds]
Artifacts: docs/artifacts/capacity_quality.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")
ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)
STREAM_PATH = os.path.join(RESULTS_DIR, "flagship600_stream.npy")
VAL_PATH = os.path.join(RESULTS_DIR, "flagship600_val.npy")

LR = 3e-4
N_X_DIMS = 28 * 28 * 1


def run_arm(name, cfg, budget_s, platform="tpu", seed=0):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    model = ConvCFlow(cfg)
    if platform == "tpu":
        # init on host, ship once (flagship_split.py rationale: the tunnel
        # dispatches each orthogonal QR draw as its own round trip)
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            state = create_train_state(
                model, jnp.zeros((1, 28, 28, 2)), LR, seed=seed
            )
        state = jax.device_put(state, jax.devices()[0])
    else:
        state = create_train_state(
            model, jnp.zeros((1, 28, 28, 2)), LR, seed=seed
        )
    step, eval_step = make_step_fns(model, noise_mode="none")

    mm = np.load(STREAM_PATH, mmap_mode="r")
    vset = np.load(VAL_PATH)
    kdummy = jax.random.PRNGKey(0)
    one = jnp.float32(1.0)

    # warm the compile outside the budget (both arms pay their own compile
    # once in production; the budget compares steady-state training)
    state, out = step(state, jnp.asarray(mm[0, 0]), kdummy, one)
    float(out["loss"])
    float(eval_step(state, jnp.asarray(vset[0]))["loss"])

    # The stream bakes annealed noise into its first ANNEAL epochs
    # (flagship_split.py:78). On TPU an arm can consume the whole
    # 600-epoch stream well inside the budget; wrapping back to epoch 0
    # would blast the converged model with annealing-phase noise every
    # lap, so past the first pass we cycle only the clean region.
    ANNEAL = 100
    traj = []
    t0 = time.time()
    ep = 0
    while time.time() - t0 < budget_s:
        if ep < mm.shape[0]:
            src_ep = ep
        else:
            src_ep = ANNEAL + (ep - mm.shape[0]) % (mm.shape[0] - ANNEAL)
        losses = []
        for i in range(mm.shape[1]):
            state, out = step(state, jnp.asarray(mm[src_ep, i]), kdummy, one)
            losses.append(float(out["loss"]))  # host readback forces sync
        ep += 1
        if ep == 1 or ep % 10 == 0:
            vz, vd, vl = [], [], []
            for i in range(len(vset)):
                o = eval_step(state, jnp.asarray(vset[i]))
                vz.append(float(o["z_loss"]))
                vd.append(float(o["detJ_loss"]))
                vl.append(float(o["loss"]))
            bpd = (np.mean(vz) + np.mean(vd)) / (np.log(2.0) * N_X_DIMS)
            traj.append({
                "epoch": ep,
                "t": round(time.time() - t0, 1),
                "train_loss": round(float(np.mean(losses)), 1),
                "val_loss": round(float(np.mean(vl)), 1),
                "val_bits_per_dim": round(float(bpd), 4),
            })
            print(json.dumps({"arm": name, **traj[-1]}), flush=True)
    return {
        "config": {
            "num_kernels": list(cfg.num_kernels),
            "cardinality": list(cfg.cardinality),
            "fused_subnet": bool(getattr(cfg, "fused_subnet", False)),
            "compute_dtype": str(getattr(cfg, "compute_dtype", "float32")),
            "layer_norm": bool(cfg.layer_norm),
        },
        "epochs_completed": ep,
        "seconds": round(time.time() - t0, 1),
        "trajectory": traj,
        "final": traj[-1] if traj else None,
        "best_val_bits_per_dim": (
            min(t["val_bits_per_dim"] for t in traj) if traj else None
        ),
    }


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    platform = sys.argv[2] if len(sys.argv) > 2 else "tpu"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    from arl_conditional_normalizing_flows_tpu.models import ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.models.arch import (
        perf_arch_config,
    )

    parity = ConvFlowConfig(
        io_shape=(28, 28, 2), x_d=1, squeeze_factor_blocks=(0, 1, 0, 0),
        res_blocks=(3, 3, 3, 3), num_kernels=(64, 64, 32, 32),
        cardinality=(8, 8, 4, 4), ksize=3, layer_norm=True,
    )
    perf = perf_arch_config(layer_norm=True)
    # width/dtype disambiguation arm: the preset's width at fp32 compute
    perf_fp32 = perf_arch_config(layer_norm=True, compute_dtype="float32")

    art_path = os.path.join(ART_DIR, "capacity_quality.json")
    out = {
        "task": "class-conditional 28x28 synthetic, flagship stream, "
                "matched wall-clock, held-out val bits/dim "
                "(noise-floored-logit parity metric)",
        "budget_seconds": budget,
        "platform": platform,
        "arms": {},
    }
    if only and os.path.exists(art_path):
        with open(art_path) as f:
            out = json.load(f)  # merge new arms into the existing artifact
    for name, cfg in (("parity_arch", parity), ("capacity_preset", perf),
                      ("capacity_fp32", perf_fp32)):
        if only and name not in only:
            continue
        out["arms"][name] = run_arm(name, cfg, budget, platform)

    os.makedirs(ART_DIR, exist_ok=True)
    with open(os.path.join(ART_DIR, "capacity_quality.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        name: {"epochs": a["epochs_completed"],
               "final_val_bpd": a["final"]["val_bits_per_dim"] if a["final"] else None,
               "best_val_bpd": a["best_val_bits_per_dim"]}
        for name, a in out["arms"].items()
    }, indent=2))


if __name__ == "__main__":
    main()
