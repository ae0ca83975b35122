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


# ---------------------------------------------------------------------------
# distributed (multi-host) epoch feeds
# ---------------------------------------------------------------------------


def test_class_conditional_epoch_distributed_class_pure_and_complete():
    """Assembled global batches (one slot per shard) must stay class-pure,
    cover each shard's distinct examples, and be deterministic from the key
    (the multi-host form of conv_cINN.py:271-304)."""
    src = _source(batch=8)  # 24 per class -> 3 slots/class
    key = jax.random.PRNGKey(7)
    shards = 2
    feeds = [
        [np.asarray(b) for b in src.epoch_distributed(key, 0, shards, s)]
        for s in range(shards)
    ]
    # identical schedule length on every shard
    assert len(feeds[0]) == len(feeds[1]) > 0
    # per class: 3 slots // 2 shards = 1 group -> 2 global batches total
    assert len(feeds[0]) == len(src.slot_groups(shards))
    for b0, b1 in zip(*feeds):
        glob = np.concatenate([b0, b1])
        labels = glob[..., -1]
        assert np.unique(np.round(labels, 6)).size == 1  # class-pure globally
        # the two shards contribute DIFFERENT examples
        assert not np.array_equal(b0, b1)
    # determinism
    again = [np.asarray(b) for b in src.epoch_distributed(key, 0, shards, 0)]
    assert all(np.array_equal(a, b) for a, b in zip(feeds[0], again))


def test_class_conditional_epoch_distributed_single_shard_matches_epoch():
    src = _source(batch=8)
    key = jax.random.PRNGKey(3)
    a = [np.asarray(b) for b in src.epoch(key, 2)]
    b = [np.asarray(x) for x in src.epoch_distributed(key, 2, 1, 0)]
    assert all(np.array_equal(x, y) for x, y in zip(a, b)) and len(a) == len(b)


def test_sr_epoch_distributed_partitions_the_epoch():
    imgs, _ = synthetic_digits(num_per_class=16, num_classes=2, size=8)
    src = SRSource(imgs, "SR2,1", 8, noise_floor_alpha=1.0)
    key = jax.random.PRNGKey(5)
    shards = 2
    feeds = [
        [np.asarray(b) for b in src.epoch_distributed(key, 0, shards, s)]
        for s in range(shards)
    ]
    assert len(feeds[0]) == len(feeds[1]) == src.num_batches // shards
    # shards partition the epoch's examples: no overlap between global batches
    def sigs(batches):
        # residual x sums to ~0 by construction (conv_cINN.py:44-45), so
        # fingerprint examples by the |.| mass of the whole xy pair instead
        return {
            round(float(np.abs(x).sum()), 3) for b in batches for x in b
        }

    assert not (sigs(feeds[0]) & sigs(feeds[1]))
    # single-shard degenerates to epoch()
    a = [np.asarray(b) for b in src.epoch(key, 1)]
    b = [np.asarray(x) for x in src.epoch_distributed(key, 1, 1, 0)]
    assert all(np.array_equal(x, y) for x, y in zip(a, b)) and len(a) == len(b)


def test_toy_epoch_iterator_distributed_class_pure():
    from arl_conditional_normalizing_flows_tpu.data import toy_datasets

    ds = toy_datasets.make_moons_dataset()
    key = jax.random.PRNGKey(11)
    shards = 2
    feeds = [
        [
            np.asarray(b)
            for b in ds.epoch_iterator_distributed(key, 4, 32, shards, s)
        ]
        for s in range(shards)
    ]
    # 4 batches/class // 2 shards = 2 groups/class x n_classes
    n_classes = len(ds.class_labels)
    assert len(feeds[0]) == len(feeds[1]) == 2 * n_classes
    for b0, b1 in zip(*feeds):
        glob = np.concatenate([b0, b1])
        # y column is the standardized class label: constant within the
        # assembled global batch
        assert np.unique(np.round(glob[:, 2], 5)).size == 1
        assert not np.array_equal(b0, b1)
    # single-shard degenerates to epoch_iterator
    a = [np.asarray(b) for b in ds.epoch_iterator(key, 4, 32)]
    b = [
        np.asarray(x) for x in ds.epoch_iterator_distributed(key, 4, 32, 1, 0)
    ]
    assert all(np.array_equal(x, y) for x, y in zip(a, b)) and len(a) == len(b)
