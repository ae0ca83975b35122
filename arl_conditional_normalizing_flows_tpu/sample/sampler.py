"""Conditional sampling / inference engine.

The reference has no sampling module — the pattern lives inline in the toy
plot code (TOYcINN.py:438-448): draw z ~ N(0,1), concatenate the desired
condition y', run the inverse map.  Here it is a first-class, jitted, shardable
engine: sample fan-out over a device mesh, condition sweeps (including
off-manifold labels, TOYcINN.py:1115-1206), post-processing (de-logit,
SR-residual reconstruction) and moment statistics for parity checks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from arl_conditional_normalizing_flows_tpu.ops import logit as logit_ops


def postprocess_sampled_xy(xy, y, x_d, *, de_logit=False, residual=False,
                           logit_a=0.01):
    """Post-processing shared by local sampling and the serving export
    (serve.export.make_image_serving_fn): split off x, optionally invert the
    logit transform (conv_cINN_base_functions.py:287-318), optionally
    reconstruct the SR-residual image as x + y (conv_cINN.py:44-45).

    Args:
        xy: sampled (..., H, W, x_d + y_d) output of ``sample_xy``.
        y: the (broadcastable) condition actually fed to the sampler; when
            its channel count is narrower than x, the residual fallback adds
            the model's own mapped y channels instead.
    """
    x = xy[..., :x_d]
    y_out = xy[..., x_d:]
    if de_logit:
        x = logit_ops.de_logitify(x, logit_a)
    if residual:
        x = x + y[..., :x_d] if y.shape[-1] >= x_d else x + y_out
    return x


def _jit_sample(fn, mesh):
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P("data")))


def sample_conditional(model, params, key, y_value, num_samples, x_d, mesh=None):
    """Toy-style sampling: x | y' for a scalar/vector condition.

    Args:
        y_value: scalar (or (y_d,) vector) condition, already standardized the
            same way the training labels were.
    Returns:
        xy samples, shape (num_samples, x_d + y_d).
    """
    y_value = jnp.atleast_1d(jnp.asarray(y_value, jnp.float32))
    y_d = y_value.shape[-1]

    def _sample(key):
        z = jax.random.normal(key, (num_samples, x_d))
        y = jnp.broadcast_to(y_value, (num_samples, y_d))
        zy = jnp.concatenate([z, y], axis=-1)
        return model.apply(params, zy, method="inverse")

    return _jit_sample(_sample, mesh)(key)


def sweep_conditions(model, params, key, y_values, num_samples, x_d):
    """Class-interpolation sweep: samples for each condition in ``y_values``
    (the reference sweeps y in {-2..2} incl. off-manifold labels,
    TOYcINN.py:1115-1206).  Returns (len(y_values), num_samples, io)."""
    y_values = jnp.asarray(y_values, jnp.float32)
    if y_values.ndim == 1:
        y_values = y_values[:, None]
    keys = jax.random.split(key, y_values.shape[0])

    @jax.jit
    def one(k, y):
        z = jax.random.normal(k, (num_samples, x_d))
        y = jnp.broadcast_to(y, (num_samples, y_values.shape[-1]))
        zy = jnp.concatenate([z, y], axis=-1)
        return model.apply(params, zy, method="inverse")

    return jax.vmap(one)(keys, y_values)


def sample_conditional_images(
    model,
    params,
    key,
    y_image,
    num_samples,
    x_d,
    *,
    de_logit: bool = False,
    residual: bool = False,
    logit_a: float = 0.01,
    mesh=None,
):
    """Conv-style sampling: x | y' for an image-shaped condition.

    Args:
        y_image: (H, W, y_d) condition plane — a broadcast class plane
            (conv_cINN.py:250-268) or an upsampled low-res image (SR).
        de_logit: apply the inverse logit transform to the x channels
            (conv_cINN_base_functions.py:287-318).
        residual: SR-residual mode — the returned image is x + y
            (conv_cINN.py:44-45, conv_cINN_base_functions.py:252-264).
    Returns:
        x images, shape (num_samples, H, W, x_d).
    """
    h, w, y_d = y_image.shape

    def _sample(key):
        z = jax.random.normal(key, (num_samples, h, w, x_d))
        y = jnp.broadcast_to(y_image, (num_samples, h, w, y_d))
        xy = model.apply(params, z, y, method="sample_xy")
        return postprocess_sampled_xy(
            xy, y, x_d, de_logit=de_logit, residual=residual, logit_a=logit_a
        )

    return _jit_sample(_sample, mesh)(key)


def conditional_moments(samples, axis=0):
    """Mean/std/skew summary of a sample batch — the Monte-Carlo parity
    statistic used against the reference (BASELINE.md north star)."""
    mean = jnp.mean(samples, axis=axis)
    std = jnp.std(samples, axis=axis)
    # center with keepdims so any sample axis (not just 0) aligns correctly
    c = samples - jnp.mean(samples, axis=axis, keepdims=True)
    skew = jnp.mean(c**3, axis=axis) / jnp.maximum(std**3, 1e-12)
    return {"mean": mean, "std": std, "skew": skew}
