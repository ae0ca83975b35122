"""Windowed trajectory comparison for the flagship-600 parity legs.

Prints 50-epoch window means of the training loss for every leg present in
benchmarks/results (reference seeds, ours seeds, and --tag hypothesis legs
such as the matched-numerics CPU leg and the per-group-init leg), restricted
to epochs all compared legs have reached. This is the analysis behind the
PARITY.md §5 attribution table: on a chaotic 128-image problem, single-epoch
values oscillate by hundreds of nats, but 50-epoch windows separate the
implementation bands cleanly from epoch ~150 on.

Usage: python tools/flagship_windows.py [window_size]
"""

import glob
import json
import os
import sys

import numpy as np

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results",
)


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            rows[r["epoch"]] = r  # last write wins (resume overlap)
    return rows


def collect():
    legs = {}
    for p in sorted(glob.glob(os.path.join(RESULTS, "flagship600_*.jsonl"))):
        name = os.path.basename(p)[len("flagship600_"):-len(".jsonl")]
        rows = load(p)
        if rows:
            legs[name] = rows
    return legs


def window_mean(rows, lo, hi):
    """(mean, n_epochs_present) over [lo, hi]; a partially-reached window
    reports its true count so it can be marked (ADVICE r3)."""
    v = [rows[e]["loss"] for e in range(lo, hi + 1) if e in rows]
    return (float(np.mean(v)), len(v)) if v else (None, 0)


def main():
    win = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    legs = collect()
    if not legs:
        raise SystemExit(f"no flagship600_*.jsonl logs under {RESULTS}")
    ours_seeds = {n: r for n, r in legs.items()
                  if n == "ours" or (n.startswith("ours_s") and n[6:].isdigit())}
    refs = {n: r for n, r in legs.items() if n.startswith("ref")}
    others = {n: r for n, r in legs.items()
              if n not in ours_seeds and n not in refs}
    max_ep = max(max(r) for r in legs.values())
    hdr = f"{'window':>10} {'tpu-band-lo':>11} {'tpu-band-hi':>11}"
    for n in sorted(refs):
        hdr += f" {n:>10}"
    for n in sorted(others):
        hdr += f" {n:>12}"
    print(hdr)
    # epochs are 1-based; start at 1 so the first window is shown, and
    # suffix '*' on any cell averaging fewer than `win` epochs (a leg that
    # stopped mid-window) — both ADVICE r3 fixes
    def cell(rows, lo, hi, width):
        m, cnt = window_mean(rows, lo, hi)
        if m is None:
            return " " * (width + 1)
        mark = "*" if cnt < hi - lo + 1 else " "
        return f" {m:{width - 1}.1f}{mark}"

    for lo in range(1, max_ep + 1, win):
        hi = min(lo + win - 1, max_ep)
        band = [window_mean(r, lo, hi) for r in ours_seeds.values()]
        full = all(c in (0, hi - lo + 1) for _, c in band)
        band = [b for b, c in band if b is not None]
        line = f"{lo}-{hi:>5}"
        if band:
            mark = " " if full else "*"
            line += f" {min(band):11.1f} {max(band):10.1f}{mark}"
        else:
            line += " " * 24
        for n in sorted(refs):
            line += cell(refs[n], lo, hi, 10)
        for n in sorted(others):
            line += cell(others[n], lo, hi, 12)
        print(line)
    print("\n('*' = window not fully covered by that leg)")
    print("legs:", ", ".join(f"{n}({max(r)}ep)" for n, r in sorted(legs.items())))


if __name__ == "__main__":
    main()
