"""Measured per-category decomposition of the flagship train step (VERDICT
r2 next-round item 2: turn the "~9 ms attainable floor" estimate into a
measurement).

Profiles a scanned multi-step train program on the real TPU via
jax.profiler (works through the axon tunnel — docs/PERF_NOTES.md round-2
note), parses the exported trace, and buckets DEVICE-side op time into:

- conv          XLA fusions/custom-calls executing convolutions
- convert       bf16<->f32 convert fusions around the f32 log-det math
- data_movement copies / transposes / reshapes / slices / concats
                (mask compress/combine relayouts, squeeze, factor)
- other         everything else (reductions, elementwise law, optimizer)

and reconciles the total against utils.roofline's computed lower bound.
Writes benchmarks/results/step_decomposition.json.

Usage:  python tools/step_decompose.py [--inner 16] [--batch 128]
        BENCH_* env vars are honored like bench.py (arch/dtype/fusion).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "benchmarks", "results")


CATEGORY_PATTERNS = [
    # order matters: first match wins
    ("conv", re.compile(r"convolution|conv_general|cudnn|%conv", re.I)),
    ("convert", re.compile(r"convert", re.I)),
    (
        "data_movement",
        re.compile(
            r"\bcopy|transpose|reshape|slice|concatenate|pad|gather|"
            r"dynamic-update|bitcast",
            re.I,
        ),
    ),
]


def categorize(name: str, extra: str = "") -> str:
    text = f"{name} {extra}"
    for cat, pat in CATEGORY_PATTERNS:
        if pat.search(text):
            return cat
    return "other"


def parse_trace(logdir: str):
    """Parse the exported trace.json.gz: device-line complete events only."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace.json.gz under {logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map pid/tid -> line name to keep only device (TPU) lines, excluding
    # host threads and derived "Steps"/"XLA Modules" summary lines
    proc_names, thread_names = {}, {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    rows = []
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pname = proc_names.get(ev.get("pid"), "")
        tname = thread_names.get((ev.get("pid"), ev.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if any(k in tname for k in ("Steps", "Modules", "Framework", "Scope")):
            continue
        # control-flow WRAPPER events (the scan's while loop) enclose their
        # body ops on the same timeline — counting them double-counts every
        # child. Keep leaves only.
        if re.match(r"^(while|conditional|call)[.\d]*$", ev.get("name", "")):
            continue
        args = ev.get("args") or {}
        extra = " ".join(
            str(args.get(k, ""))
            for k in ("long_name", "tf_op", "hlo_op", "hlo_category", "name")
        )
        rows.append(
            {
                "name": ev.get("name", ""),
                "dur_us": float(ev.get("dur", 0.0)),
                "extra": extra,
                "thread": tname,
            }
        )
    return rows, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--logdir", default="/tmp/cnf_decompose_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace in --logdir (no TPU run); "
                    "measured_step_ms is carried over from the saved report")
    args = ap.parse_args()

    if args.parse_only:
        with open(os.path.join(RESULTS, "step_decomposition.json")) as f:
            prev = json.load(f)
        # re-bucket with the step counts the TRACE was recorded with, not
        # whatever --inner/--iters defaults this invocation has
        args.inner = int(prev["scan_inner"])
        args.iters = int(prev.get("iters", args.iters))
        rows, trace_path = parse_trace(args.logdir)
        by_cat = defaultdict(lambda: [0.0, 0])
        by_name = defaultdict(lambda: [0.0, 0])
        for r in rows:
            cat = categorize(r["name"], r["extra"])
            by_cat[cat][0] += r["dur_us"]
            by_cat[cat][1] += 1
            key_name = re.sub(r"[.\d]+$", "", r["name"]) or r["name"]
            by_name[key_name][0] += r["dur_us"]
            by_name[key_name][1] += 1
        n_steps = args.inner * args.iters
        total_us = sum(v[0] for v in by_cat.values())
        prev["decomposition"] = {
            cat: {
                "ms_per_step": round(v[0] / n_steps / 1e3, 3),
                "ops_per_step": round(v[1] / n_steps, 1),
                "share": round(v[0] / total_us, 3),
            }
            for cat, v in sorted(by_cat.items(), key=lambda kv: -kv[1][0])
        }
        prev["top_ops"] = {
            k: {"ms_per_step": round(v[0] / n_steps / 1e3, 3),
                "ops_per_step": round(v[1] / n_steps, 1)}
            for k, v in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:25]
        }
        prev["device_total_ms_per_step"] = round(total_us / n_steps / 1e3, 2)
        print(json.dumps(prev, indent=2))
        with open(os.path.join(RESULTS, "step_decomposition.json"), "w") as f:
            json.dump(prev, f, indent=2)
        return

    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_scan_train_step,
        make_step_fns,
    )
    from arl_conditional_normalizing_flows_tpu.utils import roofline_report

    cfg = ConvFlowConfig(
        io_shape=(28, 28, 2), x_d=1, squeeze_factor_blocks=(0, 1, 0, 0),
        res_blocks=(3, 3, 3, 3), num_kernels=(64, 64, 32, 32),
        cardinality=(8, 8, 4, 4), ksize=3,
        fused_subnet=os.environ.get("BENCH_FUSED", "1") == "1",
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )
    model = ConvCFlow(cfg)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        rng.normal(size=(args.inner, args.batch) + cfg.io_shape), jnp.float32
    )
    state = create_train_state(model, xy[0, :1], learning_rate=3e-4)
    multi = make_scan_train_step(model, num_inner=args.inner, noise_mode="none")
    key = jax.random.PRNGKey(0)
    alpha = jnp.float32(1.0)

    t0 = time.perf_counter()
    state, out = multi(state, xy, key, alpha)
    float(out["loss"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    # honest step time (blocking readback), same methodology as bench.py
    t0 = time.perf_counter()
    state, out = multi(state, xy, key, alpha)
    float(out["loss"])
    wall = time.perf_counter() - t0
    step_ms = wall / args.inner * 1e3

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        state, out = multi(state, xy, key, alpha)
        float(out["loss"])
    jax.profiler.stop_trace()

    rows, trace_path = parse_trace(args.logdir)
    by_cat = defaultdict(lambda: [0.0, 0])
    by_name = defaultdict(lambda: [0.0, 0])
    for r in rows:
        cat = categorize(r["name"], r["extra"])
        by_cat[cat][0] += r["dur_us"]
        by_cat[cat][1] += 1
        key_name = re.sub(r"[.\d]+$", "", r["name"]) or r["name"]
        by_name[key_name][0] += r["dur_us"]
        by_name[key_name][1] += 1

    n_steps = args.inner * args.iters
    total_us = sum(v[0] for v in by_cat.values())
    decomposition = {
        cat: {
            "ms_per_step": round(v[0] / n_steps / 1e3, 3),
            "ops_per_step": round(v[1] / n_steps, 1),
            "share": round(v[0] / total_us, 3),
        }
        for cat, v in sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    }
    top_names = {
        k: {"ms_per_step": round(v[0] / n_steps / 1e3, 3),
            "ops_per_step": round(v[1] / n_steps, 1)}
        for k, v in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:25]
    }

    # computed bound for reconciliation
    step, _ = make_step_fns(model, noise_mode="none")
    compiled = step.lower(state, xy[0], key, alpha).compile()
    bound = roofline_report(
        compiled, wall / args.inner, jax.devices()[0].device_kind,
        batch=args.batch,
    )

    report = {
        "arch": "flagship 28x28 (conv_cINN.py:56-65)",
        "batch": args.batch,
        "scan_inner": args.inner,
        "iters": args.iters,
        "measured_step_ms_blocking": round(step_ms, 2),
        "device_total_ms_per_step": round(total_us / n_steps / 1e3, 2),
        "decomposition": decomposition,
        "top_ops": top_names,
        "roofline_bound_ms": round(
            bound.get("roofline_lower_bound_seconds", 0.0) * 1e3, 2
        ),
        "conv_bound_ms": round(bound.get("conv_bound_seconds", 0.0) * 1e3, 2),
        "trace": trace_path,
    }
    print(json.dumps(report, indent=2))
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "step_decomposition.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
