"""Fused coupling-subnet Pallas TPU kernel.

The flagship conv architecture executes as hundreds of SEQUENTIAL small convs
(entry conv -> N x [1x1 -> dilated grouped branches -> 1x1 + shortcut] ->
head conv, per coupling; conv_cINN_make_model.py:1076-1213 and
conv_cINN_base_functions.py:502-627 define the chain). Each XLA conv round-
trips its ~6-13 MB activation through HBM, so the step is HBM-bandwidth-bound
at ~4% MXU utilization (docs/PERF_NOTES.md device profile: ~680 sequential
10 us conv fusions).

This kernel runs the ENTIRE subnet chain for a batch tile inside one Pallas
program with every activation resident in VMEM:

- spatial convs are computed as tap matmuls: pad once per stage, then one
  ``dot_general`` per kernel tap (9 for a 3x3), accumulating in float32 —
  MXU work with zero HBM traffic between stages;
- grouped dilated branches use dense block-diagonal expanded kernels (the
  zero blocks are free relative to the MXU idle time; the expansion happens
  OUTSIDE the kernel and is differentiable, so parameters keep the exact
  grouped shapes/init of the reference architecture);
- the three branch outputs are never concatenated: the following 1x1 conv is
  computed as a sum of per-branch matmuls (branch widths never touch lanes).

The same math is available as a plain-jnp function (:func:`subnet_apply_ref`)
which serves as the CPU fallback and the equivalence oracle for tests.

Parameter layout matches the flax ``ConvCouplingNet`` shapes one-to-one (see
``flax_param_order``), so checkpoints transfer by leaf renaming only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEAKY_SLOPE = 0.3  # Keras LeakyReLU default (subnets.LEAKY_SLOPE)


@dataclasses.dataclass(frozen=True)
class SubnetSpec:
    """Static facts of one coupling subnet (hashable; drives kernel build).

    Mirrors ``ConvCouplingNet``'s fields for the fused (n_heads=2) or single
    head configuration with layer_norm off.
    """

    h: int
    w: int
    cin: int
    kernels: int  # trunk width K
    res_blocks: int
    cardinality: int
    ksize: int
    dilations: Tuple[int, ...]
    out_total: int  # out_channels * n_heads
    compute_dtype: str = "bfloat16"
    batch_tile: int = 8

    @property
    def widths(self) -> Tuple[int, ...]:
        return tuple(self.kernels // d for d in self.dilations)

    @property
    def pad(self) -> int:
        return max(self.dilations) * (self.ksize - 1) // 2


def flax_param_order(spec: SubnetSpec) -> Tuple[Tuple[str, Tuple[int, ...]], ...]:
    """(flax param path, shape) for each weight the kernel consumes, in the
    flat order ``subnet_apply_ref`` expects.

    The flax tree (models.subnets.ConvCouplingNet, layer_norm=False):
      Conv_0: entry; DilatedResidualBlock_r/{Conv_0 pre-1x1, Conv_1.. branches,
      Conv_{1+nd} post-1x1}; Conv_1: head.
    """
    k, K, cin = spec.ksize, spec.kernels, spec.cin
    card = spec.cardinality
    out = []
    out.append(("Conv_0/kernel", (k, k, cin, K)))
    out.append(("Conv_0/bias", (K,)))
    for r in range(spec.res_blocks):
        blk = f"DilatedResidualBlock_{r}"
        out.append((f"{blk}/Conv_0/kernel", (1, 1, K, K)))
        out.append((f"{blk}/Conv_0/bias", (K,)))
        for i, (d, w_) in enumerate(zip(spec.dilations, spec.widths)):
            if card == 1:
                # cardinality 1 convolves the FULL trunk, no input slice
                # (models.subnets._grouped_conv first branch)
                out.append((f"{blk}/Conv_{1+i}/kernel", (k, k, K, w_)))
            else:
                # grouped kernel (k,k,w/card,w), feature_group_count=card,
                # applied to the first w trunk channels
                out.append((f"{blk}/Conv_{1+i}/kernel", (k, k, w_ // card, w_)))
            out.append((f"{blk}/Conv_{1+i}/bias", (w_,)))
        nd = len(spec.dilations)
        out.append((f"{blk}/Conv_{1+nd}/kernel", (1, 1, sum(spec.widths), K)))
        out.append((f"{blk}/Conv_{1+nd}/bias", (K,)))
    out.append(("Conv_1/kernel", (k, k, K, spec.out_total)))
    out.append(("Conv_1/bias", (spec.out_total,)))
    return tuple(out)


def expand_weights(spec: SubnetSpec, flat: Sequence[jnp.ndarray]):
    """Flax-shaped flat weights -> kernel-ready weights (differentiable).

    - grouped branch kernels become dense block-diagonal (k,k,K,w): the
      branch reads the first ``w`` trunk channels split into ``card`` groups
      (models.subnets._grouped_conv default semantics); input channels >= w
      get zero columns so the kernel can consume the full K-wide trunk.
    - the post 1x1 (1,1,sum(w),K) is split per branch into (w_d, K) so branch
      outputs are never concatenated.
    """
    order = flax_param_order(spec)
    assert len(flat) == len(order), (len(flat), len(order))
    it = iter(flat)
    nxt = lambda: next(it)
    K, k, card = spec.kernels, spec.ksize, spec.cardinality

    entry_w = nxt()
    entry_b = nxt()
    blocks = []
    for _ in range(spec.res_blocks):
        pre_w = nxt().reshape(K, K)
        pre_b = nxt()
        branch_ws, branch_bs = [], []
        for d, w_ in zip(spec.dilations, spec.widths):
            gw = nxt()
            bb = nxt()
            if card == 1:
                # already dense over the full trunk: (k,k,K,w)
                branch_ws.append(gw)
                branch_bs.append(bb)
                continue
            g = w_ // card
            # block-diagonal expansion: group i maps in [i*g,(i+1)*g) ->
            # out [i*g,(i+1)*g). scatter-free: build by channel masking.
            eye = np.zeros((card * g, w_), np.float32)
            for i in range(card):
                eye[i * g : (i + 1) * g, i * g : (i + 1) * g] = 1.0
            # gw: (k,k,g,w). tile the g input channels across groups then
            # mask: dense[a,b,cin,cout] = gw[a,b,cin % g, cout] * eye
            tiled = jnp.tile(gw, (1, 1, card, 1))  # (k,k,card*g,w)
            dense_in_w = tiled * jnp.asarray(eye)
            if w_ < K:  # zero columns for trunk channels the branch ignores
                dense = jnp.concatenate(
                    [dense_in_w,
                     jnp.zeros((k, k, K - w_, w_), dense_in_w.dtype)], axis=2
                )
            else:
                dense = dense_in_w
            branch_ws.append(dense)
            branch_bs.append(bb)
        post_w = nxt().reshape(sum(spec.widths), K)
        post_b = nxt()
        post_ws = []
        off = 0
        for w_ in spec.widths:
            post_ws.append(post_w[off : off + w_, :])
            off += w_
        blocks.append((pre_w, pre_b, branch_ws, branch_bs, post_ws, post_b))
    head_w = nxt()
    head_b = nxt()
    return entry_w, entry_b, blocks, head_w, head_b


def _lrelu(v):
    return jnp.where(v > 0, v, LEAKY_SLOPE * v)


def _conv_taps(x, w, dil, ksize, dtype):
    """x (T,H,W,Cin) [dtype], w (k,k,Cin,Cout) -> f32 (T,H,W,Cout) via
    per-tap matmuls on a zero-padded copy.

    Padding matches XLA/flax SAME exactly: total ``dil*(k-1)`` split
    low = total//2, high = total - low (asymmetric for even kernel sizes —
    a symmetric ``P = total//2`` both sides computes a DIFFERENT function
    for even ksize)."""
    total = dil * (ksize - 1)
    lo, hi = total // 2, total - total // 2
    H, W = x.shape[1], x.shape[2]
    if total:
        xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    else:
        xp = x
    acc = None
    for ty in range(ksize):
        for tx in range(ksize):
            xs = jax.lax.slice(
                xp,
                (0, ty * dil, tx * dil, 0),
                (xp.shape[0], ty * dil + H, tx * dil + W, xp.shape[3]),
            )
            d = jax.lax.dot_general(
                xs, w[ty, tx].astype(dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    return acc


def subnet_math(x, expanded, spec: SubnetSpec):
    """The whole subnet chain on values — valid BOTH inside a Pallas kernel
    and as plain traced jnp (the fallback/oracle path).

    x: (T,H,W,cin) float32. Returns (T,H,W,out_total) float32 (pre tanh/scale
    — head post-processing stays outside, models.subnets.ConvCouplingNet).
    """
    entry_w, entry_b, blocks, head_w, head_b = expanded
    dt = jnp.dtype(spec.compute_dtype)
    k = spec.ksize

    y = _conv_taps(x.astype(dt), entry_w, 1, k, dt) + entry_b
    for pre_w, pre_b, branch_ws, branch_bs, post_ws, post_b in blocks:
        t = _lrelu(y)
        t = jax.lax.dot_general(
            t.astype(dt), pre_w.astype(dt),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pre_b
        t = _lrelu(t).astype(dt)
        u = None
        for d, bw, bb, pw in zip(spec.dilations, branch_ws, branch_bs, post_ws):
            s = _conv_taps(t, bw, d, k, dt) + bb
            s = _lrelu(s)
            c = jax.lax.dot_general(
                s.astype(dt), pw.astype(dt),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = c if u is None else u + c
        y = y + u + post_b
    t = _lrelu(y)
    o = _conv_taps(t.astype(dt), head_w, 1, k, dt) + head_b
    return o


def subnet_apply_ref(spec: SubnetSpec, x, flat_weights):
    """Plain-jnp oracle/fallback: same math, no Pallas."""
    expanded = expand_weights(spec, flat_weights)
    return subnet_math(x, expanded, spec)


def _flatten_expanded(expanded):
    entry_w, entry_b, blocks, head_w, head_b = expanded
    flat = [entry_w, entry_b]
    for pre_w, pre_b, branch_ws, branch_bs, post_ws, post_b in blocks:
        flat += [pre_w, pre_b, *branch_ws, *branch_bs, *post_ws, post_b]
    flat += [head_w, head_b]
    return flat


def _unflatten_expanded(spec: SubnetSpec, flat):
    it = iter(flat)
    nxt = lambda: next(it)
    entry_w, entry_b = nxt(), nxt()
    blocks = []
    nd = len(spec.dilations)
    for _ in range(spec.res_blocks):
        pre_w, pre_b = nxt(), nxt()
        branch_ws = [nxt() for _ in range(nd)]
        branch_bs = [nxt() for _ in range(nd)]
        post_ws = [nxt() for _ in range(nd)]
        post_b = nxt()
        blocks.append((pre_w, pre_b, branch_ws, branch_bs, post_ws, post_b))
    head_w, head_b = nxt(), nxt()
    return entry_w, entry_b, blocks, head_w, head_b


@functools.lru_cache(maxsize=None)
def _build_pallas_fn(spec: SubnetSpec, batch: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = spec.batch_tile
    while batch % T:
        T //= 2
    T = max(T, 1)

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        flat = [r[:] for r in refs[:-1]]
        expanded = _unflatten_expanded(spec, flat)
        o_ref[:] = subnet_math(x_ref[:], expanded, spec)

    def call(x, flat_expanded):
        shapes = [w.shape for w in flat_expanded]
        return pl.pallas_call(
            kernel,
            grid=(batch // T,),
            in_specs=[
                pl.BlockSpec((T, spec.h, spec.w, spec.cin),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
            ]
            + [
                pl.BlockSpec(s, lambda i, _n=len(s): (0,) * _n,
                             memory_space=pltpu.VMEM)
                for s in shapes
            ],
            out_specs=pl.BlockSpec((T, spec.h, spec.w, spec.out_total),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, spec.h, spec.w, spec.out_total), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(x, *flat_expanded)

    return call


def subnet_apply_pallas(spec: SubnetSpec, x, flat_weights, interpret=False):
    """Fused-subnet forward via one Pallas program per batch tile.

    x: (B, h, w, cin) float32 (leading batch only — callers vmap/reshape any
    extra leading dims away). Weights: flax-shaped flat list.
    """
    expanded = expand_weights(spec, flat_weights)
    flat_expanded = _flatten_expanded(expanded)
    # cast weights to compute dtype once, outside the kernel
    dt = jnp.dtype(spec.compute_dtype)
    flat_expanded = [
        w.astype(dt) if w.ndim >= 2 else w.astype(jnp.float32)
        for w in flat_expanded
    ]
    call = _build_pallas_fn(spec, x.shape[0], interpret)
    return call(x.astype(jnp.float32), flat_expanded)


def _on_tpu() -> bool:
    try:
        # this environment's remote TPU registers as platform "axon"
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def make_subnet_fn(spec: SubnetSpec, force_pallas: bool = False,
                   interpret: bool = False):
    """Differentiable fused-subnet apply: ``fn(x, flat_weights)``.

    Forward runs the Pallas megakernel on TPU (plain jnp same-math
    elsewhere); backward currently recomputes via the jnp math under
    ``jax.vjp`` (XLA-fused tap matmuls). A fully fused Pallas backward is the
    planned replacement — the custom_vjp boundary is already in place.
    """
    use_pallas = force_pallas or _on_tpu()

    @jax.custom_vjp
    def f(x, flat):
        if use_pallas:
            return subnet_apply_pallas(spec, x, flat, interpret=interpret)
        return subnet_apply_ref(spec, x, flat)

    def f_fwd(x, flat):
        return f(x, flat), (x, flat)

    def f_bwd(res, g):
        x, flat = res
        _, vjp = jax.vjp(
            lambda x_, fl: subnet_apply_ref(spec, x_, fl), x, list(flat)
        )
        return tuple(vjp(g))

    f.defvjp(f_fwd, f_bwd)
    return f


def subnet_apply(spec: SubnetSpec, x, flat_weights):
    """Dispatch: Pallas on TPU, plain jnp elsewhere (differentiable)."""
    return make_subnet_fn(spec)(x, list(flat_weights))
