"""Architecture configs and static derivations for the conv flow.

Everything here is trace-time numpy: per-block scales and io shapes
(conv_cINN_make_model.py:1487-1536), the fixed per-block mask order [0,1,2,3]
(conv_cINN_make_model.py:1545-1550), and the automatic dilation schedule
(conv_cINN_make_model.py:1552-1610).

The architecture string (:func:`arch_string`) mirrors the reference's
filename-encoded compatibility contract between noise pre-training and real
training (conv_cINN.py:519,531,641; README.md:98).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ConvFlowConfig:
    """Hyperparameters of the multi-scale conv cFlow
    (conv_cINN_make_model.py:1408-1484, conv_cINN.py:56-91)."""

    io_shape: Tuple[int, int, int]  # (H, W, D) of the concatenated xy tensor
    x_d: int  # channels of x; y' occupies channels [x_d:]
    squeeze_factor_blocks: Tuple[int, ...] = (0, 1, 0, 0)
    res_blocks: Tuple[int, ...] = (3, 3, 3, 3)
    num_kernels: Tuple[int, ...] = (64, 64, 32, 32)
    cardinality: Tuple[int, ...] = (8, 8, 4, 4)
    ksize: int = 3
    dilations: bool = True
    layer_norm: bool = False
    lambda_y: float = 100.0  # conv_cINN_make_model.py:1438
    # Fuse the A and b subnets into one two-headed network. The reference keeps
    # them separate (conv_cINN_make_model.py:1107-1213); fusing halves the conv
    # launches and doubles arithmetic intensity per conv — a TPU-side option
    # that changes parameterization but not the architecture class.
    fused_subnet: bool = False
    # Compute dtype for the coupling subnets (params stay float32; log-det and
    # loss accumulate in float32 regardless).
    compute_dtype: str = "float32"
    # Reproduce the reference's ACTUAL grouped-conv runtime behavior (its
    # per-group Lambda slices late-bind the loop variable, so every group
    # reads the last group's channels — conv_cINN_base_functions.py:399-404).
    # Default False = the documented/intended grouped convolution.
    ref_compat_group_slice: bool = False
    # Match the reference's per-group-INDEPENDENT orthogonal kernel draws
    # for grouped convs (it builds cardinality separate Conv2D layers,
    # conv_cINN_base_functions.py:399-411, each orthogonalized on its own).
    # Our single feature_group_count kernel is otherwise orthogonalized as
    # one joint matrix — identical per-group marginals, different joint
    # distribution (models.subnets.per_group_orthogonal). Parity knob;
    # kernel SHAPES are unchanged so checkpoints transfer either way.
    # NOTE: tested at the flagship-600 budget and found neutral — the
    # reference's ACTUAL init is ref_compat_shared_init below.
    ref_compat_group_init: bool = False
    # The reference's TRUE epoch-0 distribution: the driver reuses ONE
    # Orthogonal(0.1) initializer INSTANCE for every Conv2D
    # (conv_cINN.py:90-91), and TF2 Keras initializer instances are
    # stateless — same instance + same shape = identical values. So the
    # reference draws ONE orthogonal matrix per unique kernel shape, shared
    # across all layers of that shape, and every grouped conv's groups are
    # identical copies of one square draw (verified on the transplanted
    # epoch-0 tree, tools/init_probe_blocks.py). This distribution is what
    # closes the flagship-600 tail offset (PARITY.md §5 refinit leg).
    # Applied post-init by train.create_train_state via
    # models.init_compat.shared_shape_reinit; kernel shapes unchanged.
    ref_compat_shared_init: bool = False
    # Alternative lowerings of the SAME math, kept reproducible behind one
    # opt-in knob. Every one of these measured SLOWER than the default
    # XLA path on v5e (docs/PERF_NOTES.md "Experiments that did NOT pay") —
    # they exist for A/B regression and for re-testing on future
    # hardware/compilers, not for production use. At most one may be active:
    #   "pallas_coupling" — fused Pallas kernel for the coupling law +
    #       log-det (ops.pallas.affine_coupling); ~6% slower (XLA already
    #       fuses the elementwise law into the neighboring convs).
    #   "fused_dilated"   — all parallel dilated grouped branches as ONE
    #       masked dense conv; 2.4x slower (the 9x9 dense kernel's ~4.6x
    #       extra FLOPs beat the small-conv overhead it removes).
    #   "dense_groups"    — each grouped conv as a block-diagonal dense conv
    #       (models.subnets.DenseMaskedGroupConv); ~8% slower (XLA's
    #       feature_group_count lowering already fills the lanes well).
    #   "pallas_subnet"   — a coupling subnet's whole conv chain as one
    #       VMEM-resident Pallas program (ops.pallas.fused_subnet); ~16x
    #       slower (Mosaic relayout traffic dwarfs the HBM round trips it
    #       saves). Requires layer_norm off and default grouped semantics.
    experimental_lowering: Optional[str] = None
    # Keep ALL flow activations (inter-layer tensors, mask moves, coupling
    # law) in compute_dtype instead of converting each coupling's head and
    # law back to float32. Log-det and loss reductions still accumulate in
    # float32. MEASURED SLOWER on v5e (~10% train, 2.2x sampling — XLA
    # already fuses the converts; see docs/PERF_NOTES.md); kept opt-in for
    # memory-constrained cases. No-op when compute_dtype == float32.
    flow_in_compute_dtype: bool = False
    # Leave the coupling HEAD tensors (A, b) in compute_dtype instead of
    # materializing a float32 copy after the head conv; the affine law then
    # upcasts them INSIDE its elementwise fusion (ops.coupling promotes to
    # the widest operand dtype), so the flow tensors stay float32 but the
    # separate convert pass over the head disappears. Changes tanh/scale to
    # compute_dtype precision — a bench-mode knob, not a parity knob.
    # No-op when compute_dtype == float32.
    late_head_cast: bool = False

    def __post_init__(self):
        n = len(self.squeeze_factor_blocks)
        assert (
            len(self.res_blocks) == n
            and len(self.num_kernels) == n
            and len(self.cardinality) == n
        ), "architecture lists must have equal length (conv_cINN_make_model.py:1459-1463)"
        h, w, _ = self.io_shape
        assert h % 2 == 0 and w % 2 == 0, "io spatial dims must be even"
        for k, c in zip(self.num_kernels, self.cardinality):
            assert k % 2 == 0 and c % 2 == 0, (
                "kernels and cardinality must be even (conv_cINN_make_model.py:1472-1479)"
            )
        assert all(s in (0, 1) for s in self.squeeze_factor_blocks)
        assert self.ksize >= 1, "ksize must be a positive kernel size"
        assert self.experimental_lowering in (
            None, "pallas_coupling", "fused_dilated", "dense_groups",
            "pallas_subnet",
        ), f"unknown experimental_lowering {self.experimental_lowering!r}"
        assert not (
            self.late_head_cast
            and self.experimental_lowering == "pallas_coupling"
        ), "late_head_cast requires the XLA coupling law (mixed-dtype promote)"
        if self.fused_pallas_subnet:
            assert not self.layer_norm, (
                "pallas_subnet does not implement layer_norm — use the "
                "flax subnet path"
            )
            assert not (
                self.ref_compat_group_slice or self.flow_in_compute_dtype
            ), "pallas_subnet supports only the default subnet semantics"

    # internal views of the lowering knob (field names the model code and
    # the perf notes use; exactly one is true when the knob is set)
    @property
    def use_pallas_coupling(self) -> bool:
        return self.experimental_lowering == "pallas_coupling"

    @property
    def fuse_dilated_conv(self) -> bool:
        return self.experimental_lowering == "fused_dilated"

    @property
    def dense_masked_groups(self) -> bool:
        return self.experimental_lowering == "dense_groups"

    @property
    def fused_pallas_subnet(self) -> bool:
        return self.experimental_lowering == "pallas_subnet"


def perf_arch_config(io_shape=(28, 28, 2), x_d=1, **overrides) -> ConvFlowConfig:
    """TPU-efficiency capacity preset (NOT the reference-parity arch).

    The reference default (num_kernels 64/32, cardinality 8/4,
    conv_cINN.py:56-65) leaves the 128-wide TPU vector lanes half-empty:
    measured on v5e, K=128 convs run at ~2.2x the FLOP-efficiency of K=64
    (docs/PERF_NOTES.md — 4x FLOPs for only 1.8x the step time). This preset
    spends that free efficiency on capacity: 128 kernels at every scale,
    cardinality 8 (branch widths 128/d stay divisible by 8 for dilations
    (1,2,4)), fused A/b subnets, bf16 compute.
    """
    base = dict(
        io_shape=io_shape,
        x_d=x_d,
        squeeze_factor_blocks=(0, 1, 0, 0),
        res_blocks=(3, 3, 3, 3),
        num_kernels=(128, 128, 128, 128),
        cardinality=(8, 8, 8, 8),
        ksize=3,
        fused_subnet=True,
        compute_dtype="bfloat16",
    )
    base.update(overrides)
    return ConvFlowConfig(**base)


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Static per-coupling-block facts derived from the config."""

    io_shape: Tuple[int, int, int]
    num_prev_factors: int
    squeeze_factor: bool
    dilations_checkerboard: Tuple[int, ...]
    dilations_channelwise: Tuple[int, ...]


def derive_blocks(cfg: ConvFlowConfig) -> Tuple[BlockPlan, ...]:
    """Derive per-block scales, shapes, factor counts and dilation schedules.

    Mirrors conv_cINN_make_model.py:1487-1617 exactly, including the shifted
    scale bookkeeping (squeeze/factor happens AFTER the block's couplings, so
    a block's scale is set by the PREVIOUS block's squeeze flag).
    """
    sf = cfg.squeeze_factor_blocks
    n = len(sf)
    h0, w0, d0 = cfg.io_shape

    scale = 1
    num_prev_factors = 0
    blocks = []
    for i in range(n):
        if i > 0 and sf[i - 1]:
            scale *= 2
            num_prev_factors += 1
        assert h0 % (scale * 2) == 0 and w0 % (scale * 2) == 0, (
            f"scale*2 must divide spatial dims at block {i} "
            "(conv_cINN_make_model.py:1526-1530)"
        )
        shape = (h0 // scale, w0 // scale, d0 * scale)
        dil_cb, dil_cw = _dilation_schedule(shape, cfg.ksize) if cfg.dilations else (
            (1,),
            (1,),
        )
        if cfg.dilations:
            nkc = cfg.num_kernels[i] // cfg.cardinality[i]
            for d in dil_cw:
                assert nkc % d == 0, (
                    f"num_kernels/cardinality must be divisible by dilation {d} "
                    f"at block {i} (conv_cINN_make_model.py:1612-1617)"
                )
            # checkerboard couplings run with HALF the kernels
            # (conv_cINN_make_model.py:419-423); each dilated branch must
            # still split evenly into cardinality groups
            for d in dil_cb:
                assert (cfg.num_kernels[i] // 2 // d) % cfg.cardinality[i] == 0, (
                    f"checkerboard branch width (num_kernels/2/{d}) must be "
                    f"divisible by cardinality at block {i}"
                )
        blocks.append(
            BlockPlan(
                io_shape=shape,
                num_prev_factors=num_prev_factors,
                squeeze_factor=bool(sf[i]),
                dilations_checkerboard=dil_cb,
                dilations_channelwise=dil_cw,
            )
        )
    return tuple(blocks)


def _dilation_schedule(block_io_shape, ksize):
    """Auto dilation schedule (conv_cINN_make_model.py:1552-1610).

    Grow the dilated kernel size via dk' = (k-1)(dk-1)+1 while
    dk < (min_dim+1)/2; checkerboard-compressed inputs have half the spatial
    extent and get one fewer dilation level.
    """
    if ksize <= 2:
        # ksize=1: dk' = (k-1)(dk-1)+1 stays 1; ksize=2: dk' = dk. Either way
        # the reference's growth loop would never terminate (its formula only
        # grows for k >= 3), so the single-level schedule is the fixed point.
        return (1,), (1,)
    min_cw = min(block_io_shape[0], block_io_shape[1])
    min_cb = min_cw / 2

    cb, cw = [], []
    d = 1
    dk = ksize
    if dk > (min_cw + 1) / 2:
        return (1,), (1,)
    guard = 0
    while dk < (min_cw + 1) / 2:
        assert guard < 10, "dilation loop ran away (conv_cINN_make_model.py:1588-1590)"
        cw.append(int(d))
        if d < (min_cb + 1) / 2:
            cb.append(int(d))
        dk = (ksize - 1) * (dk - 1) + 1
        d = (dk - ksize) / (ksize - 1) + 1
        guard += 1
    return tuple(cb), tuple(cw)


#: per-block u1 mask order — fixed (conv_cINN_make_model.py:1545-1550)
BLOCK_MASK_ORDER = (0, 1, 2, 3)


def arch_string(cfg: ConvFlowConfig) -> str:
    """Architecture identity string (compatibility contract between
    pre-training and training, format after conv_cINN.py:519)."""
    j = lambda xs: "".join(str(int(x)) for x in xs)
    return (
        f"SqFa{j(cfg.squeeze_factor_blocks)}_NRB{j(cfg.res_blocks)}"
        f"_C{'.'.join(map(str, cfg.cardinality))}"
        f"_NK{'.'.join(map(str, cfg.num_kernels))}"
        f"_KS{cfg.ksize}_D{int(cfg.dilations)}_LN{int(cfg.layer_norm)}"
        f"_IO{cfg.io_shape[0]}x{cfg.io_shape[1]}x{cfg.io_shape[2]}_XD{cfg.x_d}"
    )


@dataclasses.dataclass(frozen=True)
class ToyConfig:
    """Hyperparameters of the dense toy cINN (TOYcINN.py:84-105,
    TOYcINN_make_model.py:105-217)."""

    io_shape: int = 3
    x_d: int = 2
    num_coupling_layers: int = 24
    intermediate_dims: int = 32
    num_layers: int = 6
    lambda_y: float = 100.0
    #: execution-order permutation of the coupling layers; layer j always uses
    #: toy mask ``j % 6``. None -> identity order (shuffling is done by the
    #: driver with an explicit PRNG key, not hidden np.random state as in
    #: TOYcINN_make_model.py:207-217).
    mask_indices: Optional[Tuple[int, ...]] = None

    def ordered_indices(self) -> Tuple[int, ...]:
        if self.mask_indices is not None:
            assert sorted(self.mask_indices) == list(range(self.num_coupling_layers))
            return tuple(self.mask_indices)
        return tuple(range(self.num_coupling_layers))


def shuffle_mask_indices(rng, num_coupling_layers: int) -> Tuple[int, ...]:
    """Shuffle layer order within each group of 6, as the toy reference does
    (TOYcINN_make_model.py:207-217), with an explicit numpy Generator."""
    import numpy as np

    idx = np.arange(num_coupling_layers)
    for g in range(num_coupling_layers // 6):
        rng.shuffle(idx[6 * g : 6 * (g + 1)])
    return tuple(int(i) for i in idx)
