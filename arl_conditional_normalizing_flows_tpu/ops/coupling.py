"""Affine coupling laws with per-sample log-det accumulation.

The forward law is ``v2 = exp(A(u1)) * u2 + b(u1)`` and the inverse is the
closed form ``u2 = exp(-A(v1)) * (v2 - b(v1))``
(conv_cINN_make_model.py:1215-1253).  Unlike the reference's toy model, the
inverse never calls a linear solve (``tf.linalg.inv``,
TOYcINN_make_model.py:373) — the scale is diagonal, so the inverse is an
elementwise reciprocal everywhere in this framework.

Log-det convention: the log-determinant contribution of one coupling layer is
``sum(A(u1))`` over all non-batch axes, returned PER SAMPLE, shape ``(B,)``.
The reference's conv path batch-averages inside the layer
(conv_cINN_make_model.py:1322-1326); its toy path keeps it per-sample
(TOYcINN_make_model.py:386-387).  Per-sample is strictly more general and
identical in expectation; the training loss takes the batch mean at the end.

``exp(A)`` is computed once in the forward direction and ``exp(-A)`` once in
the inverse; A is tanh-bounded upstream so both are well-conditioned.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_forward(a, b, u2):
    """v2 = exp(a) * u2 + b, with per-sample logdet = sum over non-batch dims.

    Args:
        a: log-scale tensor A(u1), same shape as u2 (tanh-bounded upstream).
        b: shift tensor b(u1), same shape as u2.
        u2: the transformed half, shape (B, ...).
    Returns:
        (v2, delta_log_det): v2 same shape as u2, delta_log_det shape (B,).
    """
    # the law runs in the WIDEST operand dtype: with a float32 flow and a
    # late-cast bfloat16 head (models/arch.py ``late_head_cast``) the upcast
    # of a/b happens inside this elementwise fusion instead of as a separate
    # materialized convert pass; with flow_in_compute_dtype everything is
    # already the same dtype and this is a no-op
    law_dt = jnp.promote_types(a.dtype, u2.dtype)
    v2 = jnp.exp(a.astype(law_dt)) * u2.astype(law_dt) + b.astype(law_dt)
    axes = tuple(range(1, a.ndim))
    # the log-det reduction always accumulates in float32, even when the
    # coupling law itself runs in a lower compute dtype
    delta = jnp.sum(a.astype(jnp.float32), axis=axes)
    return v2, delta


def affine_inverse(a, b, v2):
    """u2 = exp(-a) * (v2 - b) (conv_cINN_make_model.py:1235-1253)."""
    law_dt = jnp.promote_types(a.dtype, v2.dtype)
    return jnp.exp(-a.astype(law_dt)) * (
        v2.astype(law_dt) - b.astype(law_dt)
    )
