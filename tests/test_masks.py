"""Mask compress/combine semantics vs a straightforward index-based oracle
(semantics from conv_cINN_make_model.py:632-1071)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.ops import masks


def checkerboard_live(h, w, which):
    """Boolean grid of live cells for checkerboard mask 0/1."""
    hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    if which == 0:
        return (hh % 2) == (ww % 2)
    return (hh % 2) != (ww % 2)


@pytest.mark.parametrize("which", [0, 1])
@pytest.mark.parametrize("shape", [(3, 4, 6, 2), (2, 8, 8, 3), (1, 2, 2, 1)])
def test_checkerboard_compress_layout(rng, which, shape):
    x = rng.normal(size=shape).astype(np.float32)
    c = np.asarray(masks.compress(jnp.asarray(x), which))
    b, h, w, d = shape
    assert c.shape == (b, h // 2, w // 2, 2 * d)
    # first D channels: grid at row-parity 0 (reference concat order,
    # conv_cINN_make_model.py:723-748)
    if which == 0:
        np.testing.assert_array_equal(c[..., :d], x[:, 0::2, 0::2, :])
        np.testing.assert_array_equal(c[..., d:], x[:, 1::2, 1::2, :])
    else:
        np.testing.assert_array_equal(c[..., :d], x[:, 0::2, 1::2, :])
        np.testing.assert_array_equal(c[..., d:], x[:, 1::2, 0::2, :])


@pytest.mark.parametrize("d", [1, 2, 3, 5])
def test_channel_compress(rng, d):
    x = rng.normal(size=(2, 4, 4, d)).astype(np.float32)
    c2 = np.asarray(masks.compress(jnp.asarray(x), 2))
    c3 = np.asarray(masks.compress(jnp.asarray(x), 3))
    np.testing.assert_array_equal(c2, x[..., 0::2])
    np.testing.assert_array_equal(c3, x[..., 1::2])
    assert c2.shape[-1] == -(-d // 2)  # ceil (conv_cINN_make_model.py:663-668)
    assert c3.shape[-1] == d // 2


@pytest.mark.parametrize("which", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(2, 4, 4, 2), (3, 6, 8, 4), (2, 4, 4, 3), (1, 2, 2, 5)])
def test_compress_combine_roundtrip(rng, which, shape):
    if which in (0, 1) and (shape[1] % 2 or shape[2] % 2):
        pytest.skip("odd spatial")
    x = rng.normal(size=shape).astype(np.float32)
    xj = jnp.asarray(x)
    u1 = masks.compress(xj, which)
    u2 = masks.compress(xj, masks.COMPLEMENT[which])
    back = np.asarray(masks.combine(u1, u2, which))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("which", [0, 1, 2, 3])
def test_zero_masked_matches_einsum_oracle(rng, which):
    shape = (2, 4, 6, 4)
    x = rng.normal(size=shape).astype(np.float32)
    got = np.asarray(masks.zero_masked(jnp.asarray(x), which))
    h, w, d = shape[1:]
    if which in (0, 1):
        live = checkerboard_live(h, w, which)[None, :, :, None]
    else:
        ch = np.zeros(d, bool)
        start = 0 if which == 2 else 1
        ch[start::2] = True
        live = ch[None, None, None, :]
    np.testing.assert_array_equal(got, np.where(live, x, 0.0))


def test_compressed_shape_consistency():
    for which in range(4):
        for shape in [(4, 4, 2), (6, 8, 3), (2, 2, 7)]:
            c = masks.compress(jnp.zeros((1,) + shape), which)
            assert c.shape[1:] == masks.compressed_shape(shape, which)


def test_toy_partitions_match_reference_tables():
    # TOYcINN_make_model.py:156-166
    for m in range(6):
        u1, u2 = masks.toy_partition(3, m)
        assert tuple(u1) == masks.TOY_MASK_U1[m]
        assert tuple(u2) == masks.TOY_MASK_U2[m]
        assert sorted(list(u1) + list(u2)) == [0, 1, 2]


def test_toy_gather_scatter_roundtrip(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    for m in range(6):
        u1i, u2i = masks.toy_partition(3, m)
        u1 = masks.toy_gather(jnp.asarray(x), u1i)
        u2 = masks.toy_gather(jnp.asarray(x), u2i)
        back = np.asarray(masks.toy_scatter_combine(u1, u2, u1i, u2i, 3))
        np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("io_shape", [2, 4, 5, 8])
@pytest.mark.parametrize("m", list(range(6)))
def test_toy_partition_general_io_shape(rng, io_shape, m):
    """The procedural fallback for io_shape != 3 (the reference only supports
    3, TOYcINN_make_model.py:152) must still be a valid coupling partition:
    disjoint, exhaustive, both sides non-empty, round-trippable, and the
    partition must actually alternate with mask id so consecutive couplings
    transform different coordinates."""
    u1, u2 = masks.toy_partition(io_shape, m)
    assert sorted(list(u1) + list(u2)) == list(range(io_shape))
    assert len(u1) > 0 and len(u2) > 0
    assert set(u1).isdisjoint(set(u2))
    # parity alternation: mask m and m+1 swap the two sides
    n1, n2 = masks.toy_partition(io_shape, m + 1)
    assert sorted(u1) == sorted(n2) and sorted(u2) == sorted(n1)
    x = rng.normal(size=(4, io_shape)).astype(np.float32)
    a = masks.toy_gather(jnp.asarray(x), u1)
    b = masks.toy_gather(jnp.asarray(x), u2)
    back = np.asarray(masks.toy_scatter_combine(a, b, u1, u2, io_shape))
    np.testing.assert_array_equal(back, x)
