"""Fudged-logit pixel transform for discrete (class-conditional) image data.

Forward (conv_cINN_base_functions.py:174-231):
    x in [0,1]  ->  logit(a + (1-a)*b*x), rescaled from [logit(a), logit(1-a)]
    to [0,1], with b = (1-2a)/(1-a) so the fudged argument spans [a, 1-a].

Inverse (conv_cINN_base_functions.py:287-318): exact algebraic inverse used to
recover pixels from samples of a logit-trained model.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _logit(x):
    return jnp.log(x / (1.0 - x))


def logitify(x, a=0.01):
    """x in [0,1] -> fudged logit rescaled to [0,1]."""
    b = (1.0 - 2.0 * a) / (1.0 - a)
    lo = _logit(jnp.asarray(a, dtype=jnp.result_type(x, jnp.float32)))
    hi = -lo  # logit(1-a) = -logit(a)
    z = _logit(a + (1.0 - a) * b * x)
    return (z - lo) / (hi - lo)


def logitify_np(x, a=0.01):
    """Pure-numpy :func:`logitify` for host-side data workers (the streaming
    record loader transforms batches in a background thread and must not
    dispatch device ops there). Same formula, float32 math."""
    x = np.asarray(x, np.float32)
    a = np.float32(a)
    b = (1.0 - 2.0 * a) / (1.0 - a)
    lo = np.float32(np.log(a / (1.0 - a), dtype=np.float32))
    hi = -lo
    arg = (a + (1.0 - a) * b * x).astype(np.float32)
    z = np.log(arg / (1.0 - arg), dtype=np.float32)
    return ((z - lo) / (hi - lo)).astype(np.float32)


def de_logitify(x, a=0.01):
    """Inverse of :func:`logitify` (conv_cINN_base_functions.py:287-318)."""
    b = (1.0 - 2.0 * a) / (1.0 - a)
    lo = _logit(jnp.asarray(a, dtype=jnp.result_type(x, jnp.float32)))
    hi = -lo
    z = x * (hi - lo) + lo
    logistic = 1.0 / (1.0 + jnp.exp(-z))
    return (logistic - a) / (b * (1.0 - a))
