"""Multi-scale squeeze / factor-out operations.

``squeeze`` is ``tf.nn.space_to_depth(u, 2)`` (conv_cINN_make_model.py:179-183)
expressed as reshape/transpose: channel ``(dy*2+dx)*D + d`` of output pixel
(i, j) is input pixel (2i+dy, 2j+dx) channel d.  ``unsqueeze`` is the exact
inverse (``depth_to_space``, conv_cINN_make_model.py:211-215).

``factor_out`` splits off the FIRST half of the channels into the running zy
accumulator (conv_cINN_make_model.py:273-288); ``factor_in`` reintegrates the
LAST ``split`` channels of zy in front of v (conv_cINN_make_model.py:308-327).
Both log-det neutral.
"""

from __future__ import annotations

import jax.numpy as jnp


def squeeze(u, block=2):
    """space_to_depth: (..., H, W, D) -> (..., H/b, W/b, b*b*D)."""
    *lead, h, w, d = u.shape
    b = block
    assert h % b == 0 and w % b == 0, "u must have spatial dims divisible by 2"
    u = u.reshape(*lead, h // b, b, w // b, b, d)
    # (..., H/b, W/b, dy, dx, D): move block offsets next to channels
    nl = len(lead)
    perm = tuple(range(nl)) + (nl, nl + 2, nl + 1, nl + 3, nl + 4)
    u = u.transpose(perm)
    return u.reshape(*lead, h // b, w // b, b * b * d)


def unsqueeze(v, block=2):
    """depth_to_space: (..., H, W, b*b*D) -> (..., b*H, b*W, D)."""
    *lead, h, w, d4 = v.shape
    b = block
    assert d4 % (b * b) == 0, "channel depth must be divisible by 4"
    d = d4 // (b * b)
    v = v.reshape(*lead, h, w, b, b, d)
    nl = len(lead)
    perm = tuple(range(nl)) + (nl, nl + 2, nl + 1, nl + 3, nl + 4)
    v = v.transpose(perm)
    return v.reshape(*lead, b * h, b * w, d)


def factor_out(u, zy):
    """Split off the first half of channels into zy.

    Args:
        u: (..., H, W, D) with D even.
        zy: accumulated (..., H, W, Z) or None.
    Returns:
        (v, zy_new): v = u[..., D/2:], zy_new = concat([zy, u[..., :D/2]]).
    """
    d = u.shape[-1]
    split = d // 2
    factored = u[..., :split]
    v = u[..., split:]
    zy = factored if zy is None else jnp.concatenate([zy, factored], axis=-1)
    return v, zy


def factor_in(v, zy, num_prev_factors):
    """Reintegrate the last ``split`` channels of zy in front of v.

    ``split`` = channels of v when v is given; when v is None (the final
    all-zy layer) it is ``zy_depth // 2**num_prev_factors``
    (conv_cINN_make_model.py:316-321).
    """
    if v is None:
        split = zy.shape[-1] // (2 ** num_prev_factors)
    else:
        split = v.shape[-1]
    reintegrated = zy[..., -split:]
    zy_rest = zy[..., :-split]  # may be zero-width once fully consumed
    u = reintegrated if v is None else jnp.concatenate([reintegrated, v], axis=-1)
    return u, zy_rest
