"""Toy 2-D point-cloud datasets as pure-JAX batch samplers.

The reference builds per-element ``tf.data`` generator pipelines
(TOYcINN_make_datasets.py); here each dataset is a vectorized function
``(key, labels) -> (batch, 3)`` jitted end-to-end, and an epoch is a key-split
plus a batch-order permutation.  Fresh points every epoch (the reference's
motivation for generator datasets, TOYcINN_make_datasets.py:146-147) falls out
of explicit PRNG keys.

CRITICAL batching invariant preserved from the reference: every batch is
CLASS-PURE — data is batched before shuffling so each class maps independently
to the full N(0,1) prior (TOYcINN_make_datasets.py:30, :265-268).

Standardization statistics are computed ONCE from a 10^4-points-per-class
numpy draw, like the reference (TOYcINN_make_datasets.py:108-126).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PI = math.pi

# noise scales (TOYcINN_make_datasets.py:317-322)
CIRCLE_NOISE = 0.05
SLASH_NOISE = 0.05
BLOBS_NOISE = 0.15
THREE_NOISE = 0.05
GRID_NOISE = 0.05
CCIRC_NOISE = 0.05
CCIRC_FACTOR = 0.6

MIXED_CLASS_NAMES = (
    "circle",
    "slash",
    "blobs",
    "three",
    "square",
    "grid",
    "concentric_circles",
)


# ---------------------------------------------------------------------------
# per-class point samplers (vectorized over n points)
# ---------------------------------------------------------------------------


def _moon_points(key, n, class_id, noise, overlapping):
    """One crescent (TOYcINN_make_datasets.py:149-209). class_id 0 = left
    concave-down; 1/2 = right concave-up (2 = shifted to overlap)."""
    k_ang, k_n = jax.random.split(key)
    angle = jax.random.uniform(k_ang, (n,), minval=0.0, maxval=PI)
    if class_id == 0:
        x0, x1 = jnp.cos(angle), jnp.sin(angle)
    elif not overlapping:
        x0, x1 = 1.0 - jnp.cos(angle), 1.0 - jnp.sin(angle) - 0.5
    else:
        x0, x1 = 1.0 - jnp.cos(angle), 1.0 - jnp.sin(angle) + 0.25
    eps = noise * jax.random.normal(k_n, (n, 2))
    return jnp.stack([x0, x1], axis=-1) + eps


def _circle_points(key, n):
    k_ang, k_n = jax.random.split(key)
    angle = jax.random.uniform(k_ang, (n,), minval=0.0, maxval=2 * PI)
    pts = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)
    return pts + CIRCLE_NOISE * jax.random.normal(k_n, (n, 2))


def _slash_points(key, n):
    k_l, k_n = jax.random.split(key)
    line = jax.random.uniform(k_l, (n,), minval=-1.0, maxval=1.0)
    pts = jnp.stack([line, line], axis=-1)
    return pts + SLASH_NOISE * jax.random.normal(k_n, (n, 2))


def _blobs_points(key, n):
    k_s, k_n = jax.random.split(key)
    sign = 2.0 * jax.random.randint(k_s, (n,), 0, 2).astype(jnp.float32) - 1.0
    pts = jnp.stack([-0.5 * sign, 0.5 * sign], axis=-1)
    return pts + BLOBS_NOISE * jax.random.normal(k_n, (n, 2))


def _three_points(key, n):
    k_w, k_a, k_n = jax.random.split(key, 3)
    which = 2.0 * jax.random.randint(k_w, (n,), 0, 2).astype(jnp.float32) - 1.0
    angle = jax.random.uniform(k_a, (n,), minval=0.0, maxval=PI)
    x0 = (jnp.cos(angle) + which) / 2.0
    x1 = jnp.sin(angle) * 2.0 - 1.0
    pts = jnp.stack([x0, x1], axis=-1)
    return pts + THREE_NOISE * jax.random.normal(k_n, (n, 2))


def _square_points(key, n):
    return jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0)


def _grid_points(key, n):
    k_w, k_n = jax.random.split(key)
    which = jax.random.randint(k_w, (n, 2), -1, 2).astype(jnp.float32)
    return 0.8 * which + GRID_NOISE * jax.random.normal(k_n, (n, 2))


def _ccirc_points(key, n):
    k_a, k_w, k_n = jax.random.split(key, 3)
    angle = jax.random.uniform(k_a, (n,), minval=0.0, maxval=2 * PI)
    which = jax.random.randint(k_w, (n,), 0, 2).astype(jnp.float32)
    r = jnp.where(which > 0, CCIRC_FACTOR, 1.0)
    pts = jnp.stack([r * jnp.cos(angle), r * jnp.sin(angle)], axis=-1)
    return pts + CCIRC_NOISE * jax.random.normal(k_n, (n, 2))


_MIXED_SAMPLERS = (
    _circle_points,
    _slash_points,
    _blobs_points,
    _three_points,
    _square_points,
    _grid_points,
    _ccirc_points,
)


def _sector_points(key, n, center, sector_width):
    """Uniform point in a unit-circle sector centred at angle ``center``
    (TOYcINN_make_datasets.py:1137-1176)."""
    k_a, k_r = jax.random.split(key)
    angle = jax.random.uniform(
        k_a, (n,), minval=center - sector_width / 2, maxval=center + sector_width / 2
    )
    radius = jnp.sqrt(jax.random.uniform(k_r, (n,)))
    return jnp.stack([radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=-1)


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ToyDataset:
    """A class-conditional toy dataset: class-pure batch sampler plus the
    dataset-level standardization stats."""

    name: str
    class_labels: Tuple[float, ...]  # raw (pre-standardization) label values
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    _sample_class_fn: "callable" = dataclasses.field(compare=False, repr=False, default=None)

    def sample_class_batch(self, key, class_index, batch_size):
        """One class-pure standardized batch, shape (batch_size, 3)."""
        return self._sample_class_fn(key, class_index, batch_size)

    def epoch_iterator(self, key, num_batches_per_class, batch_size):
        """Yield class-pure batches in shuffled order — the reference's
        batch-then-shuffle (TOYcINN_make_datasets.py:265-268)."""
        n_classes = len(self.class_labels)
        num_batches = num_batches_per_class * n_classes
        k_perm, k_data = jax.random.split(key)
        order = jax.random.permutation(k_perm, num_batches)
        keys = jax.random.split(k_data, num_batches)
        for b in range(num_batches):
            slot = int(order[b])
            cls = slot % n_classes
            yield self.sample_class_batch(keys[slot], cls, batch_size)

    def epoch_iterator_distributed(
        self, key, num_batches_per_class, batch_size, num_shards, shard_id
    ):
        """This host's slice of a globally class-pure epoch: each global batch
        is ``num_shards`` class-pure slots of the SAME class (slot = class +
        n_classes * j), so assembling the shards keeps every global batch
        single-class — the multi-host form of the reference's
        batch-then-shuffle (TOYcINN_make_datasets.py:265-268). Per-class
        remainder slots are dropped; with ``num_shards == 1`` this is exactly
        :meth:`epoch_iterator`."""
        if num_shards == 1:
            yield from self.epoch_iterator(key, num_batches_per_class, batch_size)
            return
        assert 0 <= shard_id < num_shards
        n_classes = len(self.class_labels)
        num_batches = num_batches_per_class * n_classes
        k_perm, k_data = jax.random.split(key)
        keys = jax.random.split(k_data, num_batches)
        groups = []
        for cls in range(n_classes):
            slots = [cls + n_classes * j for j in range(num_batches_per_class)]
            for g in range(len(slots) // num_shards):
                groups.append(slots[g * num_shards : (g + 1) * num_shards])
        assert groups, (
            f"{num_batches_per_class} batches per class is fewer than the "
            f"{num_shards} hosts — every global batch group would be empty"
        )
        order = jax.random.permutation(k_perm, len(groups))
        for gi in order:
            slot = groups[int(gi)][shard_id]
            yield self.sample_class_batch(keys[slot], slot % n_classes, batch_size)

    def epoch_array(self, key, num_batches_per_class, batch_size):
        """Whole epoch at once: (num_batches, batch_size, 3), batches
        class-pure, order shuffled. Vectorized; preferred on TPU."""
        n_classes = len(self.class_labels)
        num_batches = num_batches_per_class * n_classes
        k_perm, k_data = jax.random.split(key)
        keys = jax.random.split(k_data, num_batches)
        classes = jnp.arange(num_batches) % n_classes
        batches = jax.vmap(
            lambda k, c: self._sample_class_fn(k, c, batch_size)
        )(keys, classes)
        order = jax.random.permutation(k_perm, num_batches)
        return batches[order]


def _standardize_stats(points_per_class_fn, labels, n=10_000, seed=1234):
    """Dataset mean/std from a large numpy-side draw
    (TOYcINN_make_datasets.py:108-126)."""
    rows = []
    key = jax.random.PRNGKey(seed)
    for i, lab in enumerate(labels):
        key, sub = jax.random.split(key)
        pts = np.asarray(points_per_class_fn(sub, i, n))
        rows.append(
            np.concatenate([pts, np.full((n, 1), lab, np.float32)], axis=1)
        )
    xy = np.concatenate(rows, axis=0)
    return tuple(xy.mean(0).astype(np.float32)), tuple(xy.std(0).astype(np.float32))


def make_moons_dataset(noise=0.05, overlapping=False) -> ToyDataset:
    """Crescents (TOYcINN_make_datasets.py:17-270). Classes: 0 = left moon;
    1 (or 2 when overlapping) = right moon."""
    labels = (0.0, 2.0) if overlapping else (0.0, 1.0)

    def raw_points(key, class_index, n):
        def left(k):
            return _moon_points(k, n, 0, noise, overlapping)

        def right(k):
            return _moon_points(k, n, 2 if overlapping else 1, noise, overlapping)

        if isinstance(class_index, (int, np.integer)):
            return left(key) if class_index == 0 else right(key)
        # trace-safe branch on a traced class index (vmap/jit)
        return jax.lax.cond(class_index == 0, left, right, key)

    mean, std = _standardize_stats(raw_points, labels)
    mean_a, std_a = jnp.asarray(mean), jnp.asarray(std)
    labels_a = jnp.asarray(labels, jnp.float32)

    @partial(jax.jit, static_argnums=(2,))
    def sample(key, class_index, n):
        pts = raw_points(key, class_index, n)
        lab = jnp.full((n, 1), labels_a[class_index])
        xy = jnp.concatenate([pts, lab], axis=1)
        return (xy - mean_a) / std_a

    return ToyDataset("crescents", labels, mean, std, sample)


def make_mixed_dataset(which_classes: Sequence[int]) -> ToyDataset:
    """Mixed shapes (TOYcINN_make_datasets.py:274-1110).

    ``which_classes`` selects shapes 0-6; training labels are the REMAPPED
    indices 0..N-1 so they are evenly spaced
    (TOYcINN_make_datasets.py:338-344).
    """
    which = tuple(int(c) for c in which_classes)
    labels = tuple(float(i) for i in range(len(which)))

    def raw_points(key, class_index, n):
        if isinstance(class_index, (int, np.integer)):
            return _MIXED_SAMPLERS[which[int(class_index)]](key, n)
        branches = [partial(_MIXED_SAMPLERS[c], n=n) for c in which]
        return jax.lax.switch(class_index, branches, key)

    mean, std = _standardize_stats(raw_points, labels)
    mean_a, std_a = jnp.asarray(mean), jnp.asarray(std)

    @partial(jax.jit, static_argnums=(2,))
    def sample(key, class_index, n):
        pts = raw_points(key, class_index, n)
        lab = jnp.full((n, 1), jnp.asarray(class_index, jnp.float32))
        xy = jnp.concatenate([pts, lab], axis=1)
        return (xy - mean_a) / std_a

    return ToyDataset("mixed", labels, mean, std, sample)


def sample_continuous_sectors(key, num_points, sector_width):
    """Continuous-condition dataset: y ~ U[0, 2pi), x uniform in the sector
    centred at y (TOYcINN_make_datasets.py:1114-1205). NOT standardized
    (the reference skips it, :1177-1178). Returns (num_points, 3)."""
    k_y, k_pt = jax.random.split(key)
    y = jax.random.uniform(k_y, (num_points,), minval=0.0, maxval=2 * PI)
    k_a, k_r = jax.random.split(k_pt)
    angle = y + jax.random.uniform(
        k_a, (num_points,), minval=-sector_width / 2, maxval=sector_width / 2
    )
    radius = jnp.sqrt(jax.random.uniform(k_r, (num_points,)))
    return jnp.stack(
        [radius * jnp.cos(angle), radius * jnp.sin(angle), y], axis=-1
    )


def sample_discrete_sectors(key, num_points_per_sector, which_sectors, sector_width):
    """Pinned-condition sectors for eval sweeps
    (TOYcINN_make_datasets.py:1207-1300). Returns a list of per-sector
    class-pure batches, each (num_points_per_sector, 3)."""
    out = []
    keys = jax.random.split(key, len(which_sectors))
    for k, center in zip(keys, which_sectors):
        pts = _sector_points(k, num_points_per_sector, center, sector_width)
        lab = jnp.full((num_points_per_sector, 1), center, jnp.float32)
        out.append(jnp.concatenate([pts, lab], axis=1))
    return out
