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
    v = [rows[e]["loss"] for e in range(lo, hi + 1) if e in rows]
    return float(np.mean(v)) if v else None


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
    for lo in range(win, max_ep - win + 1, win):
        hi = lo + win - 1
        band = [window_mean(r, lo, hi) for r in ours_seeds.values()]
        band = [b for b in band if b is not None]
        line = f"{lo}-{hi:>5}"
        line += (f" {min(band):11.1f} {max(band):11.1f}" if band
                 else " " * 24)
        for n in sorted(refs):
            m = window_mean(refs[n], lo, hi)
            line += f" {m:10.1f}" if m is not None else " " * 11
        for n in sorted(others):
            m = window_mean(others[n], lo, hi)
            line += f" {m:12.1f}" if m is not None else " " * 13
        print(line)
    print("\nlegs:", ", ".join(f"{n}({max(r)}ep)" for n, r in sorted(legs.items())))


if __name__ == "__main__":
    main()
