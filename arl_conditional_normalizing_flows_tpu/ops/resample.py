"""Image up/down-sampling used by the super-resolution pipelines.

``down`` is the reference's 2x2 average-pool via reshape+mean
(conv_cINN_base_functions.py:106-119); ``up`` is 2x2 nearest-neighbour via
repeat (conv_cINN_base_functions.py:151-157).  Both accept arbitrary leading
batch dims (the reference special-cases batched vs unbatched,
conv_cINN_base_functions.py:88-94 — here the ellipsis handles it).
"""

from __future__ import annotations

import jax.numpy as jnp


def down(img, factor=2):
    """(..., H, W, D) -> (..., H/f, W/f, D) by block averaging."""
    *lead, h, w, d = img.shape
    f = factor
    assert h % f == 0 and w % f == 0
    img = img.reshape(*lead, h // f, f, w // f, f, d)
    return img.mean(axis=(-4, -2))


def up(img, factor=2):
    """(..., H, W, D) -> (..., f*H, f*W, D) by nearest-neighbour repeat."""
    img = jnp.repeat(img, factor, axis=-3)
    img = jnp.repeat(img, factor, axis=-2)
    return img
