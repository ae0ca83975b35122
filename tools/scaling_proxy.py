"""CPU-mesh weak-scaling proxy: framework overhead of going multi-process.

The ≥80% 1-chip -> N-hosts scaling north star (BASELINE.md) is physically
unmeasurable in this environment (one TPU chip). What CAN be measured is the
overhead the FRAMEWORK itself adds when the same global-batch training run is
split across processes: input-pipeline slot sharding, cross-process array
assembly (jax.make_array_from_process_local_data), collective scheduling and
per-batch host readbacks. This tool runs the REAL driver feed path
(ClassConditionalSource.epoch_distributed -> shard_batch -> jitted donated
train step, the same code path as drivers/conv.py) at a FIXED global batch on

  A) 1 process x 8 virtual CPU devices
  B) 2 processes x 4 virtual CPU devices each

and reports per-host and global samples/s plus the efficiency ratio B/A.
Chip-count caveat: this bounds framework overhead only — it says nothing
about ICI/DCN bandwidth on real pods (virtual CPU devices share one memory
space, so collectives are memcpy-cheap here).

Usage:
  python tools/scaling_proxy.py            # run both configs, print JSON
  python tools/scaling_proxy.py worker ... # internal per-rank entry
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "benchmarks", "results")
# worker subprocesses re-exec this file: python puts tools/ (the script dir)
# on sys.path, not the repo root — make the package importable regardless of
# whether the editable install is visible to the spawned interpreter
if REPO not in sys.path:
    sys.path.insert(0, REPO)

GLOBAL_BATCH = 64
PER_CLASS = 256  # per-class synthetic images; 2 classes
SIZE = 16
WARMUP_EPOCHS = 2
MEASURE_EPOCHS = 5


def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from arl_conditional_normalizing_flows_tpu.parallel import (
        initialize_distributed,
    )

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.parallel import (
        make_mesh,
        shard_batch,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        fit,
        make_step_fns,
    )

    nproc, rank = jax.process_count(), jax.process_index()
    per_host_batch = GLOBAL_BATCH // nproc
    imgs, labels = synthetic_digits(
        num_per_class=PER_CLASS, num_classes=2, size=SIZE
    )
    src = ClassConditionalSource(
        imgs, labels, [0, 1], per_host_batch, use_logits=True
    )
    h, w, xy_d = src.xy_shape
    cfg = ConvFlowConfig(
        io_shape=(h, w, xy_d), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(16, 16), cardinality=(2, 2),
        ksize=3, dilations=False,
    )
    model = ConvCFlow(cfg)
    mesh = make_mesh()
    state = create_train_state(model, jnp.zeros((1, h, w, xy_d)), 3e-4, seed=0)
    if nproc > 1:
        state = shard_batch(state, mesh, spec=P())
    step, _ = make_step_fns(model, mesh=mesh, noise_mode="full")

    # identical global schedule on every rank; this rank feeds its slot
    feed = lambda k, e: src.epoch_distributed(k, e, nproc, rank)
    global_batches_per_epoch = (
        len(src.slot_groups(nproc)) if nproc > 1 else src.num_batches
    )

    res = fit(
        state, step, feed, key=jax.random.PRNGKey(0),
        num_epochs=WARMUP_EPOCHS + MEASURE_EPOCHS,
        mesh=mesh, verbose=False,
    )
    rows = res.history.rows
    measured = rows[WARMUP_EPOCHS:]
    secs = sum(r["seconds"] for r in measured)
    n_samples = GLOBAL_BATCH * global_batches_per_epoch * len(measured)
    out = {
        "num_processes": nproc,
        "rank": rank,
        "devices_per_process": len(jax.local_devices()),
        "global_batch": GLOBAL_BATCH,
        "global_batches_per_epoch": global_batches_per_epoch,
        "measured_epochs": len(measured),
        "seconds": round(secs, 3),
        "global_samples_per_sec": round(n_samples / secs, 1),
        "final_loss": round(measured[-1]["loss"], 4),
    }
    print("SCALING_PROXY " + json.dumps(out), flush=True)


def _spawn(num_processes: int, devices_per_proc: int, port: int):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    procs = []
    for i in range(num_processes):
        cmd = [sys.executable, os.path.abspath(__file__), "worker"]
        if num_processes > 1:
            cmd += [
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(i),
            ]
        procs.append(
            subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env, text=True, cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    rows = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SCALING_PROXY "):
                rows.append(json.loads(line[len("SCALING_PROXY "):]))
    assert len(rows) == num_processes, outs[0][-2000:]
    return rows


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        p = argparse.ArgumentParser()
        p.add_argument("worker")
        p.add_argument("--coordinator", default=None)
        p.add_argument("--num-processes", type=int, default=None)
        p.add_argument("--process-id", type=int, default=None)
        worker(p.parse_args())
        return

    t0 = time.time()
    single = _spawn(1, 8, port=0)[0]
    multi = _spawn(2, 4, port=12741)
    four = _spawn(4, 2, port=12743)
    # all ranks time the same global run; the slower rank gates the step,
    # so the honest multi-process number is the MIN over ranks
    multi_sps = min(r["global_samples_per_sec"] for r in multi)
    four_sps = min(r["global_samples_per_sec"] for r in four)
    sps1 = single["global_samples_per_sec"]
    report = {
        "task": "fixed-global-batch weak-scaling proxy (CPU virtual mesh)",
        "global_batch": GLOBAL_BATCH,
        "arch": "conv 16x16, blocks(1,1), kernels(16,16), no dilations",
        "single_process_8dev": single,
        "two_process_4dev": multi,
        "four_process_2dev": four,
        "global_sps_1proc": sps1,
        "global_sps_2proc": multi_sps,
        "global_sps_4proc": four_sps,
        "framework_scaling_efficiency": round(multi_sps / sps1, 3),
        "framework_scaling_efficiency_4proc": round(four_sps / sps1, 3),
        # the 1 -> 2 -> 4 process trend answers whether framework overhead
        # grows with process count or is a flat per-run cost (VERDICT r3 #7)
        "efficiency_trend_1_2_4": [
            1.0, round(multi_sps / sps1, 3), round(four_sps / sps1, 3)
        ],
        # within each config the ranks time one global run and must agree
        # bit-for-bit; ACROSS configs the final loss may differ (the noise
        # key schedule depends on the slot grouping)
        "losses_identical_across_ranks": (
            len({r["final_loss"] for r in multi}) == 1
            and len({r["final_loss"] for r in four}) == 1
        ),
        "caveat": (
            "one physical machine: bounds framework overhead (input "
            "sharding, array assembly, collective scheduling, per-batch "
            "readbacks) only — not ICI/DCN bandwidth on real pods; 4 "
            "processes oversubscribe the 2-core host, so the 4-proc point "
            "is a pessimistic bound"
        ),
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(report, indent=2))
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "scaling_proxy.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
