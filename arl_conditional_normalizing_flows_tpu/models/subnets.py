"""Coupling-function subnets (flax.linen).

Dense stacks for the toy model (TOYcINN_make_model.py:29-97) and dilated
grouped-conv ResNeXt stacks for the conv model
(conv_cINN_base_functions.py:330-627, conv_cINN_make_model.py:1076-1213),
re-designed for XLA:TPU:

- grouped convolution is ONE ``feature_group_count`` conv, not a Python loop
  of per-group slices+convs (cf. conv_cINN_base_functions.py:399-411). The
  reference's group slicing reads only the first ``nb_channels`` input
  channels when a dilated branch narrows the width — reproduced here by
  slicing before the conv.
- parity details preserved: LeakyReLU negative slope 0.3 (Keras default),
  LayerNorm applied over ALL h*w*d elements jointly with eps=1e-3 (the
  flatten-reshape trick, conv_cINN_base_functions.py:345-361), orthogonal
  kernel init, zero bias init, linear b-head, tanh A-head with a learned
  scalar scale (conv_cINN_make_model.py:97-122).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

LEAKY_SLOPE = 0.3  # Keras LeakyReLU default alpha


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def orthogonal_init(scale: float = 0.1):
    """Orthogonal(gain) kernel init — the reference's NaN-at-step-0 defense
    (conv_cINN.py:90-91, TOYcINN.py:100-101)."""
    return nn.initializers.orthogonal(scale=scale)


def per_group_orthogonal(scale: float, groups: int):
    """Per-GROUP-independent Orthogonal(gain) init for a grouped-conv kernel
    of shape ``(k, k, d, groups*gd)``.

    The reference builds a grouped convolution as ``cardinality`` separate
    Conv2D layers (conv_cINN_base_functions.py:399-411), so each group's
    ``(k, k, d, gd)`` kernel is orthogonalized INDEPENDENTLY. Our single
    ``feature_group_count`` kernel is, by default, orthogonalized as ONE
    ``(k*k*d, groups*gd)`` matrix — identical per-group marginal
    distribution (any column block of a Haar matrix is Haar), but the
    groups are mutually orthogonal rather than independent. This init
    reproduces the reference's joint distribution exactly: one independent
    orthogonal sample per output-column block.
    """
    import jax

    base = nn.initializers.orthogonal(scale=scale)

    def init(key, shape, dtype=jnp.float32):
        *lead, cout = shape
        assert cout % groups == 0, (shape, groups)
        gd = cout // groups
        keys = jax.random.split(key, groups)
        blocks = [base(k, tuple(lead) + (gd,), dtype) for k in keys]
        return jnp.concatenate(blocks, axis=-1)

    return init


class FlatLayerNorm(nn.Module):
    """LayerNorm over all h*w*d elements jointly (the reference's
    flatten->LayerNorm->reshape trick, conv_cINN_base_functions.py:345-361).

    Keras LayerNormalization defaults: eps=1e-3, learned scale+bias over the
    flattened axis.
    """

    @nn.compact
    def __call__(self, y):
        *lead, h, w, d = y.shape
        flat = y.reshape(*lead, h * w * d)
        flat = nn.LayerNorm(epsilon=1e-3)(flat)
        return flat.reshape(*lead, h, w, d)


class DenseCouplingNet(nn.Module):
    """The toy A/b pair: two stacks of ``num_layers+1`` Dense+LeakyReLU with
    heads Dense(u2_size); the A head gets tanh, the b head is linear
    (TOYcINN_make_model.py:29-97; no learned scale — deliberately omitted,
    TOYcINN_make_model.py:91-92).

    Kernel init is glorot_uniform: the toy reference STORES an ``init``
    argument but never passes it to its Dense layers
    (TOYcINN_make_model.py:138 vs :29-97), so they use the Keras default.
    Orthogonal(0.1) here (as the driver intends, TOYcINN.py:100-101) makes
    the 7-layer stacks effectively dead at lr 1e-4 — detJ never trains.
    """

    u2_size: int
    intermediate_dims: int
    num_layers: int

    @nn.compact
    def __call__(self, u1):
        kinit = nn.initializers.glorot_uniform()
        a = b = u1
        for _ in range(self.num_layers + 1):
            b = leaky_relu(nn.Dense(self.intermediate_dims, kernel_init=kinit)(b))
        b = nn.Dense(self.u2_size, kernel_init=kinit)(b)
        for _ in range(self.num_layers + 1):
            a = leaky_relu(nn.Dense(self.intermediate_dims, kernel_init=kinit)(a))
        a = jnp.tanh(nn.Dense(self.u2_size, kernel_init=kinit)(a))
        return a, b


def _grouped_conv(y, nb_channels, ksize, dilation, cardinality, kinit, dtype,
                  ref_compat=False, dense_masked=False):
    """Reference grouped_convolution (conv_cINN_base_functions.py:364-411).

    Intended semantics (and our default): read the first ``nb_channels``
    input channels, split into ``cardinality`` groups, convolve each group to
    ``nb_channels/cardinality`` outputs — ONE XLA conv via
    feature_group_count.

    ``ref_compat=True`` reproduces what the reference ACTUALLY computes at
    runtime: its per-group ``Lambda(lambda z: z[:, :, :, j*_d:j*_d+_d])``
    closes over the loop variable ``j`` (conv_cINN_base_functions.py:401),
    which is late-bound — when the functional model replays, every group
    slices the LAST group's channels. Equivalent single conv: all group
    kernels (concatenated on the output axis) applied to input slice
    ``[(C-1)*_d : C*_d]``. Kernel shapes are identical in both modes, so
    checkpoints transfer.
    """
    if cardinality == 1:
        return nn.Conv(
            nb_channels,
            (ksize, ksize),
            padding="SAME",
            kernel_dilation=(dilation, dilation),
            kernel_init=kinit,
            dtype=dtype,
        )(y)
    assert nb_channels % cardinality == 0
    if ref_compat:
        d = nb_channels // cardinality
        y = y[..., (cardinality - 1) * d : cardinality * d]
        groups = 1
    else:
        y = y[..., :nb_channels]
        groups = cardinality
    if dense_masked and not ref_compat and groups > 1:
        return DenseMaskedGroupConv(
            nb_channels=nb_channels, ksize=ksize, dilation=dilation,
            cardinality=cardinality, kernel_init=kinit, dtype=dtype,
        )(y)
    return nn.Conv(
        nb_channels,
        (ksize, ksize),
        padding="SAME",
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        kernel_init=kinit,
        dtype=dtype,
    )(y)


class DenseMaskedGroupConv(nn.Module):
    """Grouped convolution lowered as ONE dense conv with a block-diagonal
    kernel (a TPU lowering experiment, not a new function class).

    The parameter has the grouped-conv kernel shape ``(k, k, cin/groups,
    cout)`` with the same orthogonal init, and is expanded to a
    block-diagonal dense ``(k, k, cin, cout)`` kernel at apply time — so the
    math, init distribution, and parameter SHAPES are identical to the
    ``feature_group_count`` path; only the XLA lowering differs. With 8-32
    channel groups the grouped lowering pads each operand to the 128-wide
    MXU lanes (16x waste); a 64-channel dense conv wastes only 2x, so the
    8x nominal-FLOP overhead of the zero blocks can still net out faster.
    """

    nb_channels: int
    ksize: int
    dilation: int
    cardinality: int
    kernel_init: nn.initializers.Initializer = orthogonal_init(0.1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        import jax.lax as lax

        k, nb, card = self.ksize, self.nb_channels, self.cardinality
        d = nb // card
        kernel = self.param("kernel", self.kernel_init, (k, k, d, nb))
        bias = self.param("bias", nn.initializers.zeros, (nb,))
        dense = jnp.zeros((k, k, nb, nb), kernel.dtype)
        for g in range(card):
            dense = dense.at[:, :, g * d : (g + 1) * d, g * d : (g + 1) * d].set(
                kernel[:, :, :, g * d : (g + 1) * d]
            )
        out = lax.conv_general_dilated(
            y.astype(self.dtype),
            dense.astype(self.dtype),
            (1, 1),
            "SAME",
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)


def _dilated_branch_mask(ksize, dilations, cardinality, nb_channels):
    """Connectivity mask for the fused dilated-branch conv.

    A dilation-d k x k kernel is a sparse (d(k-1)+1)-extent dense kernel.
    One dense conv with this 0/1 mask applied to its kernel computes ALL
    parallel branches (each with its grouped connectivity and the
    first-``nb/d``-input-channels slice) in a single MXU-efficient op.
    Returns (mask (K,K,Cin,Cout_total), K) with branch outputs concatenated
    in dilation order — matching the branch-list implementation exactly.
    """
    import numpy as _np

    dmax = max(dilations)
    K = (ksize - 1) * dmax + 1
    cin = nb_channels
    widths = [nb_channels // d for d in dilations]
    cout = sum(widths)
    mask = _np.zeros((K, K, cin, cout), _np.float32)
    off = 0
    for d, w in zip(dilations, widths):
        taps = [(K - 1) // 2 + (i - (ksize - 1) // 2) * d for i in range(ksize)]
        gsz = w // cardinality
        for g in range(cardinality):
            ins = slice(g * gsz, (g + 1) * gsz)  # reads y[..., :w] group g
            outs = slice(off + g * gsz, off + (g + 1) * gsz)
            for ty in taps:
                for tx in taps:
                    mask[ty, tx, ins, outs] = 1.0
        off += w
    return mask, K


class DilatedResidualBlock(nn.Module):
    """Pre-activation ResNeXt bottleneck with parallel dilated grouped convs
    (conv_cINN_base_functions.py:502-627). Identity shortcut (in/out widths
    are equal at every use site, conv_cINN_make_model.py:1123-1131).

    ``fuse_dilated_conv=True`` computes all dilated grouped branches with ONE
    masked dense conv (see :func:`_dilated_branch_mask`) — same function
    class and connectivity, higher nominal FLOPs but far better MXU
    utilization (docs/PERF_NOTES.md). Incompatible with
    ``ref_compat_group_slice``.
    """

    nb_channels: int  # = num_kernels: bottleneck width and output width
    dilations: Tuple[int, ...]
    ksize: int
    cardinality: int
    layer_norm: bool
    init_scale: float = 0.1
    ref_compat_group_slice: bool = False
    # match the reference's per-group-INDEPENDENT orthogonal draws for the
    # grouped-conv kernels (see per_group_orthogonal); default keeps the
    # jointly-orthogonal single-matrix init
    ref_compat_group_init: bool = False
    fuse_dilated_conv: bool = False
    dense_masked_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        kinit = orthogonal_init(self.init_scale)
        shortcut = y

        def common(t):
            t = leaky_relu(t)
            if self.layer_norm:
                t = FlatLayerNorm()(t)
            return t

        y = common(y)
        y = nn.Conv(self.nb_channels, (1, 1), kernel_init=kinit, dtype=self.dtype)(y)
        y = common(y)
        if self.fuse_dilated_conv and len(self.dilations) > 1:
            assert not self.ref_compat_group_slice, (
                "fuse_dilated_conv implements the documented grouped-conv "
                "semantics only"
            )
            assert not self.ref_compat_group_init, (
                "ref_compat_group_init (per-group orthogonal draws) is not "
                "implemented for the fused masked kernel; drop one of the "
                "two knobs (ADVICE r3)"
            )
            import jax.lax as lax

            mask, K = _dilated_branch_mask(
                self.ksize, self.dilations, self.cardinality, self.nb_channels
            )
            kernel = self.param("fused_dil_kernel", kinit, mask.shape)
            bias = self.param(
                "fused_dil_bias", nn.initializers.zeros, (mask.shape[-1],)
            )
            w = (kernel * mask).astype(self.dtype)
            y = lax.conv_general_dilated(
                y.astype(self.dtype), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(self.dtype)
        else:
            ginit = (
                per_group_orthogonal(self.init_scale, self.cardinality)
                if self.ref_compat_group_init and self.cardinality > 1
                else kinit
            )
            branches = [
                _grouped_conv(
                    y,
                    self.nb_channels // d,
                    self.ksize,
                    d,
                    self.cardinality,
                    ginit,
                    self.dtype,
                    ref_compat=self.ref_compat_group_slice,
                    dense_masked=self.dense_masked_groups,
                )
                for d in self.dilations
            ]
            y = branches[0] if len(branches) == 1 else jnp.concatenate(branches, axis=-1)
        y = common(y)
        y = nn.Conv(self.nb_channels, (1, 1), kernel_init=kinit, dtype=self.dtype)(y)
        return shortcut + y


class ConvCouplingNet(nn.Module):
    """One head-stack of the conv coupling function
    (conv_cINN_make_model.py:1076-1213): Conv(num_kernels, k) ->
    num_res_blocks x DilatedResidualBlock -> LeakyReLU -> [FlatLayerNorm] ->
    Conv(out_channels, k) head.

    ``n_heads`` > 1 emits that many stacked output heads from ONE trunk — the
    fused-A/b option (the reference always builds two separate trunks).
    The scale head (``scale_head``=True, or head 0 in fused mode) gets tanh
    plus a learned scalar initialised to 1.0 (conv_cINN_make_model.py:97-122,
    :1198-1205).
    """

    out_channels: int
    num_kernels: int
    num_res_blocks: int
    cardinality: int
    ksize: int
    dilations: Tuple[int, ...]
    layer_norm: bool
    scale_head: bool = False  # unfused: is this the A (tanh+scale) net?
    n_heads: int = 1  # fused: 2 -> returns (A, b)
    init_scale: float = 0.1
    ref_compat_group_slice: bool = False
    ref_compat_group_init: bool = False
    fuse_dilated_conv: bool = False
    dense_masked_groups: bool = False
    dtype: jnp.dtype = jnp.float32
    # keep the head (tanh + scale) in ``dtype`` instead of casting to f32 —
    # the flow_in_compute_dtype perf mode (models/arch.py)
    keep_compute_dtype: bool = False
    # skip ONLY the head's f32 materialization (late_head_cast perf mode):
    # the affine law upcasts inside its own elementwise fusion
    late_cast: bool = False

    @nn.compact
    def __call__(self, u1):
        kinit = orthogonal_init(self.init_scale)
        y = u1.astype(self.dtype)
        y = nn.Conv(
            self.num_kernels, (self.ksize, self.ksize), padding="SAME",
            kernel_init=kinit, dtype=self.dtype,
        )(y)
        for _ in range(self.num_res_blocks):
            y = DilatedResidualBlock(
                nb_channels=self.num_kernels,
                dilations=self.dilations,
                ksize=self.ksize,
                cardinality=self.cardinality,
                layer_norm=self.layer_norm,
                init_scale=self.init_scale,
                ref_compat_group_slice=self.ref_compat_group_slice,
                ref_compat_group_init=self.ref_compat_group_init,
                fuse_dilated_conv=self.fuse_dilated_conv,
                dense_masked_groups=self.dense_masked_groups,
                dtype=self.dtype,
            )(y)
        y = leaky_relu(y)
        if self.layer_norm:
            y = FlatLayerNorm()(y)
        head = nn.Conv(
            self.out_channels * self.n_heads,
            (self.ksize, self.ksize),
            padding="SAME",
            kernel_init=kinit,
            dtype=self.dtype,
        )(y)
        if not self.keep_compute_dtype and not self.late_cast:
            head = head.astype(jnp.float32)

        def scale_transform(a):
            s = self.param("tanh_scale", nn.initializers.ones, ())
            return jnp.tanh(a) * s.astype(a.dtype)

        if self.n_heads == 1:
            return scale_transform(head) if self.scale_head else head
        assert self.n_heads == 2
        a, b = jnp.split(head, 2, axis=-1)
        return scale_transform(a), b


class PallasFusedCouplingNet(nn.Module):
    """Drop-in ``ConvCouplingNet`` whose whole conv chain executes as ONE
    Pallas program per batch tile with every activation VMEM-resident
    (ops.pallas.fused_subnet — the HBM-traffic eliminator for the
    hundreds-of-small-convs architecture, docs/PERF_NOTES.md).

    Parameter LEAF SHAPES and initializers are identical to ConvCouplingNet;
    leaf names are the flax paths flattened with '.' (see
    ``fused_params_from_flax`` for checkpoint transfer). Restrictions vs the
    flax path: no layer_norm, no ref_compat/fuse/dense-masked modes.
    """

    out_channels: int
    num_kernels: int
    num_res_blocks: int
    cardinality: int
    ksize: int
    dilations: Tuple[int, ...]
    scale_head: bool = False
    n_heads: int = 1
    init_scale: float = 0.1
    dtype: jnp.dtype = jnp.float32
    interpret: bool = False  # CPU kernel testing

    def _spec(self, h, w, cin):
        from arl_conditional_normalizing_flows_tpu.ops.pallas.fused_subnet import (
            SubnetSpec,
        )

        return SubnetSpec(
            h=h, w=w, cin=cin,
            kernels=self.num_kernels,
            res_blocks=self.num_res_blocks,
            cardinality=self.cardinality,
            ksize=self.ksize,
            dilations=tuple(self.dilations),
            out_total=self.out_channels * self.n_heads,
            compute_dtype=jnp.dtype(self.dtype).name,
        )

    @nn.compact
    def __call__(self, u1):
        from arl_conditional_normalizing_flows_tpu.ops.pallas.fused_subnet import (
            flax_param_order,
            make_subnet_fn,
        )

        *lead, h, w, cin = u1.shape
        spec = self._spec(h, w, cin)
        kinit = orthogonal_init(self.init_scale)
        flat = []
        for name, shape in flax_param_order(spec):
            pname = name.replace("/", ".")
            if name.endswith("kernel"):
                flat.append(self.param(pname, kinit, shape))
            else:
                flat.append(self.param(pname, nn.initializers.zeros, shape))

        x = u1.reshape((-1, h, w, cin)).astype(jnp.float32)
        fn = make_subnet_fn(spec, interpret=self.interpret)
        head = fn(x, flat)
        head = head.reshape((*lead, h, w, spec.out_total))

        def scale_transform(a):
            s = self.param("tanh_scale", nn.initializers.ones, ())
            return jnp.tanh(a) * s.astype(a.dtype)

        if self.n_heads == 1:
            return scale_transform(head) if self.scale_head else head
        assert self.n_heads == 2
        a, b = jnp.split(head, 2, axis=-1)
        return scale_transform(a), b


def fused_params_from_flax(tree):
    """ConvCouplingNet param tree -> PallasFusedCouplingNet param tree
    (pure leaf renaming: nested flax paths joined with '.')."""
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    return {".".join(k): v for k, v in flat.items()}


def flax_params_from_fused(tree):
    """Inverse of :func:`fused_params_from_flax`."""
    import flax

    flat = {tuple(k.split(".")): v for k, v in tree.items()}
    return flax.traverse_util.unflatten_dict(flat)
