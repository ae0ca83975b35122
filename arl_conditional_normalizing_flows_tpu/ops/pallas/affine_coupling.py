"""Fused affine-coupling Pallas TPU kernels.

The coupling law ``v2 = exp(a) * u2 + b`` plus the per-sample log-det
``sum(a)`` (conv_cINN_make_model.py:1215-1326) is bandwidth-bound: the naive
lowering materializes ``exp(a)`` to HBM and re-reads ``a`` for the reduction.
These kernels do one VMEM pass per tile — compute ``exp(a)`` in registers,
write ``v2``, and accumulate the log-det across the feature grid dimension —
and a custom VJP recomputes ``exp(a)`` in the backward pass instead of saving
it (rematerialization: trade FLOPs for HBM traffic).

Inputs of any rank are flattened to ``(B, N)``; N is zero-padded to the lane
width (padding contributes ``exp(0)*0 + 0 = 0`` to v2 and ``0`` to the
log-det, so results are exact).  On non-TPU backends (and under
``interpret=True`` in tests) a jnp path with identical semantics is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BATCH_TILE = 8
FEAT_TILE = 1024

#: test hook — set True to run the kernels in the Pallas interpreter on CPU
INTERPRET = False


def _on_tpu():
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pad_feat(x, n_pad):
    if n_pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad)))


# ---------------------------------------------------------------------------
# forward: (a, b, u2) -> (v2, logdet)
# ---------------------------------------------------------------------------


def _fwd_kernel(a_ref, b_ref, u2_ref, v2_ref, ld_ref):
    j = pl.program_id(1)
    a = a_ref[:]
    v2_ref[:] = jnp.exp(a) * u2_ref[:] + b_ref[:]
    partial = jnp.sum(a, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        ld_ref[:] = partial

    @pl.when(j > 0)
    def _():
        ld_ref[:] = ld_ref[:] + partial


def _fwd_pallas_2d(a, b, u2):
    B, N = a.shape
    bt = BATCH_TILE if B % BATCH_TILE == 0 else B
    nt = min(FEAT_TILE, N)
    grid = (B // bt, pl.cdiv(N, nt))
    v2, ld = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N), a.dtype),
            jax.ShapeDtypeStruct((B, 1), a.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * B * N,
            bytes_accessed=5 * B * N * a.dtype.itemsize,
            transcendentals=B * N,
        ),
        interpret=INTERPRET,
    )(a, b, u2)
    return v2, ld[:, 0]


@jax.custom_vjp
def fused_affine_forward(a, b, u2):
    """v2 = exp(a)*u2 + b and per-sample logdet = sum(a, nonbatch axes).

    Drop-in replacement for ``ops.coupling.affine_forward`` with a fused
    Pallas TPU path.  Shapes: a, b, u2 identical, any rank >= 2 with batch
    leading; returns (v2 same shape, logdet (B,)).
    """
    return _forward_impl(a, b, u2)


def _forward_impl(a, b, u2):
    shape = a.shape
    B = shape[0]
    a2 = a.reshape(B, -1)
    N = a2.shape[1]
    if not _on_tpu():
        v2 = jnp.exp(a2) * u2.reshape(B, -1) + b.reshape(B, -1)
        return v2.reshape(shape), jnp.sum(a2, axis=1)
    n_pad = -N % LANE
    a_p = _pad_feat(a2, n_pad)
    b_p = _pad_feat(b.reshape(B, -1), n_pad)
    u_p = _pad_feat(u2.reshape(B, -1), n_pad)
    v2, ld = _fwd_pallas_2d(a_p, b_p, u_p)
    return v2[:, :N].reshape(shape), ld


def _forward_fwd(a, b, u2):
    out = _forward_impl(a, b, u2)
    return out, (a, u2)


def _forward_bwd(res, g):
    a, u2 = res
    gv2, gld = g
    shape = a.shape
    B = shape[0]
    # broadcast gld back over non-batch axes
    gld_b = gld.reshape((B,) + (1,) * (a.ndim - 1))
    ea = jnp.exp(a)
    du2 = gv2 * ea
    db = gv2
    da = gv2 * ea * u2 + gld_b
    return da, db, du2


fused_affine_forward.defvjp(_forward_fwd, _forward_bwd)


# ---------------------------------------------------------------------------
# inverse: (a, b, v2) -> u2 = exp(-a) * (v2 - b)
# ---------------------------------------------------------------------------


def _inv_kernel(a_ref, b_ref, v2_ref, u2_ref):
    u2_ref[:] = jnp.exp(-a_ref[:]) * (v2_ref[:] - b_ref[:])


def fused_affine_inverse(a, b, v2):
    """u2 = exp(-a)*(v2 - b) (conv_cINN_make_model.py:1235-1253), fused."""
    shape = a.shape
    B = shape[0]
    a2 = a.reshape(B, -1)
    N = a2.shape[1]
    if not _on_tpu():
        u2 = jnp.exp(-a2) * (v2.reshape(B, -1) - b.reshape(B, -1))
        return u2.reshape(shape)
    n_pad = -N % LANE
    a_p = _pad_feat(a2, n_pad)
    b_p = _pad_feat(b.reshape(B, -1), n_pad)
    v_p = _pad_feat(v2.reshape(B, -1), n_pad)
    Bp, Np = a_p.shape
    bt = BATCH_TILE if B % BATCH_TILE == 0 else B
    nt = min(FEAT_TILE, Np)
    u2 = pl.pallas_call(
        _inv_kernel,
        grid=(B // bt, pl.cdiv(Np, nt)),
        in_specs=[
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * Bp * Np,
            bytes_accessed=4 * Bp * Np * a.dtype.itemsize,
            transcendentals=Bp * Np,
        ),
        interpret=INTERPRET,
    )(a_p, b_p, v_p)
    return u2[:, :N].reshape(shape)
