"""Instance noise (annealing + permanent noise floor) and noise renewal.

Two variants exist in the reference and both are kept:

- conv: ``alpha*xy + (1-alpha)*N(0,1)`` over the WHOLE xy tensor
  (conv_cINN_base_functions.py:635-654) — used both for the annealing ramp
  (alpha: 0 -> 1) and as the permanent 2% noise floor (alpha=0.98,
  conv_cINN.py:307-315) that dequantizes delta-valued pixels;
- toy: noise applied ONLY to the x components, the condition y is untouched
  (TOYcINN_make_datasets.py:1324-1329).

``renew_noise`` regenerates a pure-N(0,1) batch (ignores its input) for the
noise pre-training stage (conv_cINN_base_functions.py:661-675).

All functions take explicit PRNG keys — the reference's "fresh noise every
epoch" tf.data semantics become key-splitting at the call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_noise(key, xy, alpha):
    """alpha*xy + (1-alpha)*N(0,1) over the full tensor (conv variant)."""
    eps = jax.random.normal(key, xy.shape, xy.dtype)
    return alpha * xy + (1.0 - alpha) * eps


def instance_noise_x_only(key, xy, alpha, x_d):
    """Noise only the leading ``x_d`` feature dims; y untouched (toy variant).

    Args:
        xy: (..., D) with x in [..., :x_d] and y' in [..., x_d:].
    """
    # x_d=None would make BOTH slices the full tensor (``[..., :None]`` ==
    # ``[..., None:]`` == everything) and silently double the feature width
    assert x_d is not None and 0 < x_d < xy.shape[-1], (
        f"instance_noise_x_only needs 0 < x_d < {xy.shape[-1]}, got {x_d}"
    )
    x, y = xy[..., :x_d], xy[..., x_d:]
    eps = jax.random.normal(key, x.shape, x.dtype)
    x = alpha * x + (1.0 - alpha) * eps
    return jnp.concatenate([x, y], axis=-1)


def renew_noise(key, shape, dtype=jnp.float32):
    """A fresh standard-normal draw (noise pre-training data source)."""
    return jax.random.normal(key, shape, dtype)


def annealing_alphas(num_annealing_epochs):
    """The reference's annealing schedule alpha_i = i / N for epoch i in
    [0, N) (TOYcINN.py:249-287, conv_cINN.py:589-628)."""
    import numpy as np

    return np.arange(num_annealing_epochs) / float(num_annealing_epochs)
