"""Coupling masks, re-designed for TPU.

The reference implements conv masking with tiled einsum masks and
``tf.scatter_nd`` decompression (conv_cINN_make_model.py:632-1073) — a
gather/scatter choreography that is hostile to XLA:TPU layout. Here every mask
operation is expressed as strided slices, ``stack`` and ``reshape`` — patterns
XLA lowers to cheap relayouts/copies with no scatter at all.

Mask semantics (identical to conv_cINN_make_model.py:370-389):

- mask 0: spatial checkerboard, "live" cells at (even,even) and (odd,odd);
- mask 1: spatial checkerboard, live at (even,odd) and (odd,even);
- mask 2: channel mask, live channels ``0::2`` (gets the extra channel when the
  depth is odd — ceil, conv_cINN_make_model.py:663-668);
- mask 3: channel mask, live channels ``1::2`` (floor).

Compressed layouts (identical to conv_cINN_make_model.py:723-759):

- checkerboard: the two offset grids are concatenated channel-wise, giving
  shape ``(B, H/2, W/2, 2*D)`` — grid at row-parity 0 first;
- channelwise: strided channel slice, shape ``(B, H, W, ceil_or_floor(D/2))``.

Instead of the reference's decompress-to-zeros-then-add
(conv_cINN_make_model.py:1315-1320), :func:`combine` rebuilds the full tensor
directly from the two compressed halves via stack+reshape interleaving.

The toy (dense) 6-mask system (TOYcINN_make_model.py:154-217) is represented
as index lists; dense "masking" is a gather of 1-3 columns and the re-combine
is a static-permutation concat.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

CHECKERBOARD_MASKS = (0, 1)
CHANNEL_MASKS = (2, 3)

#: complement mask for obtaining u2 given the u1 mask
#: (conv_cINN_make_model.py:432-440)
COMPLEMENT = {0: 1, 1: 0, 2: 3, 3: 2}


def compressed_shape(shape_hwd, which_mask):
    """Shape of the masked+compressed tensor (conv_cINN_make_model.py:474-498).

    Args:
        shape_hwd: (H, W, D) of the full tensor.
        which_mask: 0..3.
    """
    h, w, d = shape_hwd
    if which_mask in CHECKERBOARD_MASKS:
        assert h % 2 == 0 and w % 2 == 0, "checkerboard needs even H, W"
        return (h // 2, w // 2, 2 * d)
    elif which_mask == 2:
        return (h, w, -(-d // 2))  # ceil
    elif which_mask == 3:
        return (h, w, d // 2)  # floor
    raise ValueError(f"bad mask index {which_mask}")


def compress(uv, which_mask):
    """Extract the live elements of ``uv`` under ``which_mask``.

    Equivalent to ``coupling_layer.mask(uv, which_mask, compress=True)``
    (conv_cINN_make_model.py:723-759) but with no masking arithmetic — just
    strided slices.

    Args:
        uv: (..., H, W, D).
        which_mask: 0..3.
    Returns:
        (..., H/2, W/2, 2D) for checkerboard; (..., H, W, ~D/2) channelwise.
    """
    if which_mask == 0:
        c0 = uv[..., 0::2, 0::2, :]
        c1 = uv[..., 1::2, 1::2, :]
        return jnp.concatenate([c0, c1], axis=-1)
    elif which_mask == 1:
        c0 = uv[..., 0::2, 1::2, :]
        c1 = uv[..., 1::2, 0::2, :]
        return jnp.concatenate([c0, c1], axis=-1)
    elif which_mask == 2:
        return uv[..., 0::2]
    elif which_mask == 3:
        return uv[..., 1::2]
    raise ValueError(f"bad mask index {which_mask}")


def combine(u1_compressed, u2_compressed, which_mask):
    """Rebuild the full tensor from compressed halves.

    ``u1_compressed`` holds the live elements under ``which_mask``;
    ``u2_compressed`` holds the live elements under ``COMPLEMENT[which_mask]``.
    This fuses the reference's decompress(+zeros) and add
    (conv_cINN_make_model.py:896-1071, :1315-1320) into interleaving
    stack/reshape — no scatter, no materialized zeros.

    Args:
        u1_compressed, u2_compressed: compressed tensors (see :func:`compress`).
        which_mask: the mask index of u1 (0..3).
    Returns:
        (..., H, W, D) full tensor.
    """
    if which_mask in CHECKERBOARD_MASKS:
        d2 = u1_compressed.shape[-1]
        assert d2 % 2 == 0
        d = d2 // 2
        # split back into the two offset grids
        a0, a1 = u1_compressed[..., :d], u1_compressed[..., d:]
        b0, b1 = u2_compressed[..., :d], u2_compressed[..., d:]
        if which_mask == 0:
            # a0 at (0,0), a1 at (1,1); b0 at (0,1), b1 at (1,0)
            q00, q01, q10, q11 = a0, b0, b1, a1
        else:
            # mask 1: a0 at (0,1), a1 at (1,0); b0 at (0,0), b1 at (1,1)
            q00, q01, q10, q11 = b0, a0, a1, b1
        return _interleave_quadrants(q00, q01, q10, q11)
    elif which_mask in CHANNEL_MASKS:
        if which_mask == 2:
            even, odd = u1_compressed, u2_compressed
        else:
            even, odd = u2_compressed, u1_compressed
        return interleave_channels(even, odd)
    raise ValueError(f"bad mask index {which_mask}")


def _interleave_quadrants(q00, q01, q10, q11):
    """Assemble (..., H, W, D) from the four (..., H/2, W/2, D) parity grids.

    q_ab sits at rows ``a::2`` and cols ``b::2``. Implemented as two
    stack+reshape interleaves (cols then rows) — pure data movement.
    """
    *lead, hh, hw, d = q00.shape
    # interleave columns: (..., H/2, W/2, 2, D) -> (..., H/2, W, D)
    row0 = jnp.stack([q00, q01], axis=-2).reshape(*lead, hh, 2 * hw, d)
    row1 = jnp.stack([q10, q11], axis=-2).reshape(*lead, hh, 2 * hw, d)
    # interleave rows: (..., H/2, 2, W, D) -> (..., H, W, D)
    out = jnp.stack([row0, row1], axis=-3).reshape(*lead, 2 * hh, 2 * hw, d)
    return out


def interleave_channels(even, odd):
    """Merge channel-compressed halves: result[..., 0::2]=even, [..., 1::2]=odd.

    Handles odd total depth (``even`` has one more channel than ``odd`` —
    the reference's ceil/floor split, conv_cINN_make_model.py:1049-1060).
    """
    de, do = even.shape[-1], odd.shape[-1]
    if de == do:
        *lead, h, w, _ = even.shape
        return jnp.stack([even, odd], axis=-1).reshape(*lead, h, w, de + do)
    assert de == do + 1, (de, do)
    # interleave the first `do` pairs, then append the trailing even channel
    *lead, h, w, _ = even.shape
    body = jnp.stack([even[..., :do], odd], axis=-1).reshape(*lead, h, w, 2 * do)
    return jnp.concatenate([body, even[..., do:]], axis=-1)


def zero_masked(uv, which_mask):
    """Full-shape tensor with non-live elements zeroed (the reference's
    ``mask(uv, m, compress=False)``, conv_cINN_make_model.py:632-717).

    Only needed where the uncompressed u1 is used directly; the coupling path
    here never materializes it (see :func:`combine`). Kept for parity tests.
    """
    comp = compress(uv, which_mask)
    zeros = jnp.zeros(
        uv.shape[:-3] + compressed_shape(uv.shape[-3:], COMPLEMENT[which_mask]),
        uv.dtype,
    )
    return combine(comp, zeros, which_mask)


# ---------------------------------------------------------------------------
# Toy (dense) 6-mask system — TOYcINN_make_model.py:154-217
# ---------------------------------------------------------------------------

#: u1 index sets for the 6 partitions of {0,1,2} (TOYcINN_make_model.py:156-161)
TOY_MASK_U1 = {
    0: (0,),
    1: (1,),
    2: (2,),
    3: (0, 1),
    4: (0, 2),
    5: (1, 2),
}
#: complementary u2 index sets (TOYcINN_make_model.py:163-166)
TOY_MASK_U2 = {
    0: (1, 2),
    1: (0, 2),
    2: (0, 1),
    3: (2,),
    4: (1,),
    5: (0,),
}


def toy_partition(io_shape, mask_id):
    """(u1_indices, u2_indices) for a toy mask id, generalized to any
    dimensionality: id selects a subset via the 3-D table for io_shape == 3;
    for other sizes we fall back to an alternating split keyed by mask_id
    parity (the reference only supports io_shape == 3,
    TOYcINN_make_model.py:152).
    """
    if io_shape == 3:
        m = mask_id % 6
        return np.array(TOY_MASK_U1[m]), np.array(TOY_MASK_U2[m])
    # procedural generalization: rotate an alternating pattern
    idx = np.arange(io_shape)
    u1 = idx[(idx + mask_id) % 2 == 0]
    u2 = idx[(idx + mask_id) % 2 == 1]
    return u1, u2


def toy_gather(u, indices):
    """u1 = M1 @ u as a column gather (TOYcINN_make_model.py:320-323)."""
    return u[..., np.asarray(indices)]


def toy_scatter_combine(u1, u2, u1_indices, u2_indices, io_shape):
    """u = M1^T u1 + M2^T u2 as a static permutation of a concat
    (TOYcINN_make_model.py:369-397 without the matvecs)."""
    order = np.concatenate([np.asarray(u1_indices), np.asarray(u2_indices)])
    inv = np.argsort(order)
    return jnp.concatenate([u1, u2], axis=-1)[..., inv]
