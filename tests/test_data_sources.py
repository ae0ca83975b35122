"""Image epoch feeders: class purity + per-epoch example reshuffling."""

import numpy as np
import jax

from arl_conditional_normalizing_flows_tpu.data.images import (
    ClassConditionalSource,
    SRSource,
    synthetic_digits,
)


def _source(batch=8, noise=1.0):
    imgs, labels = synthetic_digits(num_per_class=24, num_classes=2, size=8)
    return ClassConditionalSource(
        imgs, labels, [0, 1], batch, noise_floor_alpha=noise
    )


def test_class_conditional_batches_are_class_pure():
    src = _source()
    for xy in src.epoch(jax.random.PRNGKey(0), 0):
        yplane = np.asarray(xy[..., -1])
        # the label plane is constant within a batch (class-pure batching,
        # conv_cINN.py:271-304)
        assert np.unique(yplane).size == 1


def test_class_conditional_reshuffles_examples_across_epochs():
    """Batch MEMBERSHIP must change between epochs (the reference reshuffles
    examples every iteration; permuting only batch order replays identical
    compositions for the whole run)."""
    src = _source(noise=1.0)  # no noise so batches are comparable
    key = jax.random.PRNGKey(0)

    def batch_signatures(epoch_idx):
        sigs = set()
        for xy in src.epoch(key, epoch_idx):
            x = np.asarray(xy[..., 0])
            # order-insensitive signature of the batch's example set
            sigs.add(tuple(sorted(float(v) for v in x.sum(axis=(1, 2)))))
        return sigs

    assert batch_signatures(0) != batch_signatures(1)
    # same epoch_idx + key is deterministic
    assert batch_signatures(0) == batch_signatures(0)


def test_sr_source_reshuffles_examples_across_epochs():
    imgs, _ = synthetic_digits(num_per_class=16, num_classes=2, size=8)
    src = SRSource(imgs, "SR2,1", 8, noise_floor_alpha=1.0)
    key = jax.random.PRNGKey(3)
    first = [np.asarray(b) for b in src.epoch(key, 0)]
    second = [np.asarray(b) for b in src.epoch(key, 1)]
    assert not all(np.array_equal(a, b) for a, b in zip(first, second))


def test_write_run_metadata(tmp_path):
    import argparse
    import json

    from arl_conditional_normalizing_flows_tpu.utils import write_run_metadata

    ns = argparse.Namespace(epochs=3, outdir=str(tmp_path), classes=[0, 1])
    path = write_run_metadata(str(tmp_path), ns, extra={"arch": "X"})
    with open(path) as f:
        meta = json.load(f)
    assert meta["args"]["epochs"] == 3
    assert meta["arch"] == "X"
    assert "backend" in meta and "timestamp" in meta
