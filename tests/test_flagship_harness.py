"""flagship_split harness: checkpoint/resume of the `ours` training legs.

A multi-hour matched-numerics CPU leg must survive a crash (round-3 lesson:
the first 369-epoch attribution leg died with its state). The JAX leg is
deterministic, so a resumed run must reproduce a continuous run's epoch rows
EXACTLY — this is what makes partial legs mergeable evidence.
"""

import json
import os
import sys

import numpy as np
import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")
sys.path.insert(0, BENCH_DIR)

import flagship_split  # noqa: E402

TINY_ARCH = ((0, 1), (1, 1), (8, 8), (2, 2))
TINY_SHAPE = (8, 8, 2)


@pytest.fixture
def tiny_harness(tmp_path, monkeypatch):
    """Point the harness at a tmp results dir + a tiny materialized stream."""
    epochs, bpe, batch = 6, 2, 4
    rng = np.random.default_rng(0)
    stream = rng.normal(size=(epochs, bpe, batch) + TINY_SHAPE).astype(np.float32)
    stream_path = str(tmp_path / "stream.npy")
    np.save(stream_path, stream)
    monkeypatch.setattr(flagship_split, "RESULTS_DIR", str(tmp_path))
    monkeypatch.setattr(flagship_split, "STREAM_PATH", stream_path)
    monkeypatch.setattr(flagship_split, "ARCH", TINY_ARCH)
    monkeypatch.setattr(flagship_split, "XY_SHAPE", TINY_SHAPE)
    monkeypatch.setattr(flagship_split, "BATCHES_PER_EPOCH", bpe)
    return tmp_path


def _rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_ours_resume_reproduces_continuous_run(tiny_harness):
    # continuous 6-epoch leg
    flagship_split.run_ours(6, "cpu", tag="cont", ckpt_every=2)
    cont = _rows(tiny_harness / "flagship600_ours_cont.jsonl")
    assert [r["epoch"] for r in cont] == [1, 2, 3, 4, 5, 6]

    # interrupted leg: 4 epochs (checkpoint lands at epoch 4), then resume to 6
    flagship_split.run_ours(4, "cpu", tag="broken", ckpt_every=2)
    assert os.path.exists(tiny_harness / "flagship600_ours_broken.ckpt.npz")
    flagship_split.run_ours(6, "cpu", tag="broken", ckpt_every=2, resume=True)
    res = _rows(tiny_harness / "flagship600_ours_broken.jsonl")
    # resume appended only epochs 5-6 (no duplicate re-run of 1-4)
    assert [r["epoch"] for r in res] == [1, 2, 3, 4, 5, 6]

    for a, b in zip(cont, res):
        for k in ("loss", "z_loss", "y_loss", "detJ_loss"):
            assert a[k] == b[k], (a["epoch"], k, a[k], b[k])


def test_val_leg_logs_heldout_components(tiny_harness, monkeypatch):
    """--val legs evaluate the fixed held-out set on epochs 1, every
    VAL_EVERY, and the final epoch — and ONLY there — logging the four val
    components; the val eval must not perturb the training trajectory."""
    val_path = str(tiny_harness / "val.npy")
    rng = np.random.default_rng(1)
    np.save(val_path, rng.normal(
        size=(flagship_split.BATCHES_PER_EPOCH, 4) + TINY_SHAPE
    ).astype(np.float32))
    monkeypatch.setattr(flagship_split, "VAL_PATH", val_path)
    monkeypatch.setattr(flagship_split, "VAL_EVERY", 3)
    monkeypatch.setattr(flagship_split, "BATCH", 4)

    flagship_split.run_ours(5, "cpu", tag="plain")
    flagship_split.run_ours(5, "cpu", tag="withval", val=True)
    plain = _rows(tiny_harness / "flagship600_ours_plain.jsonl")
    withval = _rows(tiny_harness / "flagship600_ours_withval.jsonl")

    val_epochs = [r["epoch"] for r in withval if "val_loss" in r]
    assert val_epochs == [1, 3, 5]
    for r in withval:
        if "val_loss" in r:
            for k in ("val_loss", "val_z_loss", "val_y_loss", "val_detJ_loss"):
                assert np.isfinite(r[k])
    # eval is side-effect-free: the training trajectory is bit-identical
    for a, b in zip(plain, withval):
        for k in ("loss", "z_loss", "y_loss", "detJ_loss"):
            assert a[k] == b[k], (a["epoch"], k)


def test_resume_truncates_stale_rows(tiny_harness):
    """A leg resumed from an epoch-4 checkpoint after logging rows past the
    checkpoint must rewrite its jsonl to one row per epoch (VERDICT r4 weak
    #5: a 613-row/600-epoch artifact is ambiguous)."""
    flagship_split.run_ours(4, "cpu", tag="trunc", ckpt_every=4)
    # simulate a crashed continuation that logged rows 5-6 with no checkpoint
    log = tiny_harness / "flagship600_ours_trunc.jsonl"
    with open(log, "a") as f:
        for e in (5, 6):
            f.write(json.dumps({"epoch": e, "loss": 1.0, "z_loss": 0.0,
                                "y_loss": 0.0, "detJ_loss": 0.0,
                                "platform": "cpu", "t": 9.9}) + "\n")
    flagship_split.run_ours(6, "cpu", tag="trunc", ckpt_every=4, resume=True)
    rows = _rows(log)
    assert [r["epoch"] for r in rows] == [1, 2, 3, 4, 5, 6]
    # the stale placeholder rows were replaced by real continuation rows
    assert all(r["loss"] != 1.0 for r in rows[4:])


def test_ours_ginit_leg_changes_init_not_shapes(tiny_harness):
    """--ginit changes initial values only; the leg must still train and its
    trajectory must differ from the default-init leg on the same stream."""
    flagship_split.run_ours(2, "cpu", tag="base")
    flagship_split.run_ours(2, "cpu", tag="gi", group_init=True)
    base = _rows(tiny_harness / "flagship600_ours_base.jsonl")
    gi = _rows(tiny_harness / "flagship600_ours_gi.jsonl")
    assert len(base) == len(gi) == 2
    assert all(np.isfinite(r["loss"]) for r in base + gi)
    assert base[0]["loss"] != gi[0]["loss"]
