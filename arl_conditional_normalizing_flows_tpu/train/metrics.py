"""Metric tracking and history logging.

The reference tracks four ``keras.metrics.Mean``s — loss, z_loss, y_loss,
detJ_loss — reset each epoch (TOYcINN_make_model.py:220-246,
conv_cINN_make_model.py:1692-1718) and appends history rows with
``CSVLogger(append=True)`` (conv_cINN.py:529-536).  Here: a tiny running-mean
accumulator plus CSV/JSONL writers with a stable column order (the reference
warns its CSV column order can silently change between resumes,
conv_cINN.py:538-554 — ours is pinned).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional

LOSS_KEYS = ("loss", "z_loss", "y_loss", "detJ_loss")


class MeanMetrics:
    """Running means over an epoch for the four loss components."""

    def __init__(self, keys=LOSS_KEYS):
        self.keys = tuple(keys)
        self.reset()

    def reset(self):
        self._sums = {k: 0.0 for k in self.keys}
        self._count = 0

    def update(self, values: Dict[str, float]):
        for k in self.keys:
            self._sums[k] += float(values[k])
        self._count += 1

    @property
    def count(self) -> int:
        return self._count

    def result(self) -> Dict[str, float]:
        n = max(self._count, 1)
        return {k: self._sums[k] / n for k in self.keys}


class HistoryLogger:
    """Epoch-history logger: in-memory list + optional CSV and JSONL files
    (append mode, surviving resumes)."""

    def __init__(self, csv_path: Optional[str] = None, jsonl_path: Optional[str] = None):
        self.rows: List[Dict[str, float]] = []
        self.csv_path = csv_path
        self.jsonl_path = jsonl_path
        self._columns: Optional[List[str]] = None

    def log(self, epoch: int, metrics: Dict[str, float]):
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        self.rows.append(row)
        if self.csv_path:
            self._append_csv(row)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def _append_csv(self, row):
        if self._columns is None:
            if os.path.exists(self.csv_path) and os.path.getsize(self.csv_path):
                with open(self.csv_path) as f:
                    self._columns = next(csv.reader(f))
            else:
                self._columns = list(row.keys())
                with open(self.csv_path, "w", newline="") as f:
                    csv.writer(f).writerow(self._columns)
        with open(self.csv_path, "a", newline="") as f:
            csv.writer(f).writerow([row.get(c, "") for c in self._columns])


_TREE_COPY_JIT = None


def _tree_copy(tree):
    """Defensive on-device copy of a param pytree. The train step DONATES its
    incoming state, so storing live buffers here would leave deleted arrays
    behind after the next step; ``x + 0`` under one jit forces fresh output
    buffers while keeping each leaf's sharding (no host round-trip, and a
    single dispatch rather than one per leaf — dispatch latency is ~ms
    through a remote TPU backend)."""
    global _TREE_COPY_JIT
    if _TREE_COPY_JIT is None:
        import jax
        import jax.numpy as jnp
        from jax.tree_util import tree_map

        _TREE_COPY_JIT = jax.jit(
            lambda t: tree_map(lambda a: a + jnp.zeros((), a.dtype), t)
        )
    return _TREE_COPY_JIT(tree)


class EarlyStopping:
    """Keras-style EarlyStopping(monitor, patience, restore_best_weights=True)
    (TOYcINN.py:118-122, conv_cINN.py:140-141): stop after ``patience``
    consecutive epochs without improvement."""

    def __init__(self, patience: int, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.best_state = None
        self.wait = 0

    def update(self, value: float, state) -> bool:
        """Record this epoch's monitored value; returns True to STOP."""
        if value < self.best - self.min_delta:
            self.best = value
            self.best_state = _tree_copy(state)
            self.wait = 0
            return False
        self.wait += 1
        return self.wait >= self.patience
