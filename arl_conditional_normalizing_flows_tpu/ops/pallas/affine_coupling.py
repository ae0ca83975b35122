"""Fused affine-coupling Pallas TPU kernels.

The coupling law ``v2 = exp(a) * u2 + b`` plus the per-sample log-det
``sum(a)`` (conv_cINN_make_model.py:1215-1326) is bandwidth-bound: the naive
lowering materializes ``exp(a)`` to HBM and re-reads ``a`` for the reduction.
These kernels do one VMEM pass per tile — compute ``exp(a)`` in registers,
write ``v2``, and accumulate the log-det across the feature grid dimension —
and a custom VJP recomputes ``exp(a)`` in the backward pass instead of saving
it (rematerialization: trade FLOPs for HBM traffic).

Inputs of any rank are flattened to ``(B, N)``; N is zero-padded to a
multiple of the feature tile the kernel will use (padding contributes
``exp(0)*0 + 0 = 0`` to v2 and ``0`` to the log-det, so results are exact;
padding only to the 128-lane width would let a partial last grid block sum
out-of-bounds garbage into the log-det).  The log-det accumulates in float32
whatever the compute dtype.  On non-TPU backends (and under
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


def _grid_pad(n):
    """Zero-pad amount so every feature grid block is FULLY in bounds.

    Padding only to LANE is not enough: when the padded width exceeds
    FEAT_TILE but is not a multiple of it, the last grid block would read
    out-of-bounds (unspecified) columns and sum them into the log-det.
    Pad to a multiple of the tile width the kernel will actually use."""
    n_lane = n + (-n % LANE)
    nt = min(FEAT_TILE, n_lane)
    return (n_lane + (-n_lane % nt)) - n


# ---------------------------------------------------------------------------
# forward: (a, b, u2) -> (v2, logdet)
# ---------------------------------------------------------------------------


def _fwd_kernel(a_ref, b_ref, u2_ref, v2_ref, ld_ref):
    j = pl.program_id(1)
    a = a_ref[:]
    v2_ref[:] = jnp.exp(a) * u2_ref[:] + b_ref[:]
    # log-det accumulates in float32 regardless of the compute dtype
    # (the documented invariant, ops/coupling.py)
    partial = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)

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
    assert N % nt == 0, (N, nt)  # _pad_grid guarantees full feature blocks
    grid = (B // bt, N // nt)
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
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
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
        return v2.reshape(shape), jnp.sum(a2.astype(jnp.float32), axis=1)
    n_pad = _grid_pad(N)
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
    gld_b = gld.reshape((B,) + (1,) * (a.ndim - 1)).astype(a.dtype)
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
    n_pad = _grid_pad(N)
    a_p = _pad_feat(a2, n_pad)
    b_p = _pad_feat(b.reshape(B, -1), n_pad)
    v_p = _pad_feat(v2.reshape(B, -1), n_pad)
    Bp, Np = a_p.shape
    bt = BATCH_TILE if B % BATCH_TILE == 0 else B
    nt = min(FEAT_TILE, Np)
    u2 = pl.pallas_call(
        _inv_kernel,
        grid=(B // bt, Np // nt),
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
