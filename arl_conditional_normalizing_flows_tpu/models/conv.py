"""Multi-scale convolutional conditional flow (the TPU re-design of
``cFlow``, conv_cINN_make_model.py:1408-1904).

Layer sequence per coupling block (conv_cINN_make_model.py:1629-1689):
4 coupling layers with u1-mask order (0, 1, 2, 3), then — if the block's
squeeze/factor flag is set — a squeeze (space_to_depth) and a factor-out of
half the channels into the running zy accumulator.

Direction convention: ``forward`` = xy' -> zy (the reference's direction +1,
conv_cINN_make_model.py:1743) with per-sample log|det J|; ``inverse`` =
zy -> xy' (direction −1, conv_cINN_make_model.py:1774-1798).

Latent layout parity: after the last block, the accumulated zy and the
remaining uv are concatenated and pushed BACKWARD through only the
squeeze/factor operations so the returned zy has the exact spatial/channel
position of the corresponding xy elements (conv_cINN_make_model.py:1754-1771
— required for the y-loss and for conditional sampling).  ``inverse``
re-flattens its input through the same ops first.

All mask compress/decompress is slice/stack/reshape (see ``ops.masks``), the
inverse coupling law is an elementwise reciprocal, and the log-det is kept
PER SAMPLE (the reference batch-averages inside the layer,
conv_cINN_make_model.py:1322-1326; identical in expectation).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from arl_conditional_normalizing_flows_tpu.models.arch import (
    BLOCK_MASK_ORDER,
    ConvFlowConfig,
    derive_blocks,
)
from arl_conditional_normalizing_flows_tpu.models.subnets import ConvCouplingNet
from arl_conditional_normalizing_flows_tpu.models.toy import standard_normal_logprob
from arl_conditional_normalizing_flows_tpu.ops import coupling as coupling_ops
from arl_conditional_normalizing_flows_tpu.ops import masks as mask_ops
from arl_conditional_normalizing_flows_tpu.ops import squeeze as squeeze_ops
from arl_conditional_normalizing_flows_tpu.ops.pallas import (
    fused_affine_forward,
    fused_affine_inverse,
)


class ConvCouplingLayer(nn.Module):
    """One masked conv coupling layer (conv_cINN_make_model.py:337-1394)."""

    in_shape: Tuple[int, int, int]
    which_mask: int
    num_res_blocks: int
    cardinality: int
    num_kernels: int
    ksize: int
    dilations: Tuple[int, ...]
    layer_norm: bool
    fused_subnet: bool = False
    use_pallas: bool = False
    fused_pallas_subnet: bool = False
    ref_compat_group_slice: bool = False
    ref_compat_group_init: bool = False
    fuse_dilated_conv: bool = False
    dense_masked_groups: bool = False
    dtype: jnp.dtype = jnp.float32
    keep_compute_dtype: bool = False  # flow_in_compute_dtype (models/arch.py)
    late_cast: bool = False  # late_head_cast (models/arch.py)

    def setup(self):
        h, w, d = self.in_shape
        m = self.which_mask
        # checkerboard-compressed inputs have 2x channels / half spatial
        # extent, so get half the kernels (conv_cINN_make_model.py:419-423)
        kernels = self.num_kernels // 2 if m in (0, 1) else self.num_kernels
        self.u1c_shape = mask_ops.compressed_shape((h, w, d), m)
        self.u2c_shape = mask_ops.compressed_shape(
            (h, w, d), mask_ops.COMPLEMENT[m]
        )
        uv2_d = self.u2c_shape[-1]
        common = dict(
            out_channels=uv2_d,
            num_kernels=kernels,
            num_res_blocks=self.num_res_blocks,
            cardinality=self.cardinality,
            ksize=self.ksize,
            dilations=self.dilations,
            layer_norm=self.layer_norm,
            ref_compat_group_slice=self.ref_compat_group_slice,
            ref_compat_group_init=self.ref_compat_group_init,
            fuse_dilated_conv=self.fuse_dilated_conv,
            dense_masked_groups=self.dense_masked_groups,
            dtype=self.dtype,
            keep_compute_dtype=self.keep_compute_dtype,
            late_cast=self.late_cast,
        )
        if self.fused_pallas_subnet:
            from arl_conditional_normalizing_flows_tpu.models.subnets import (
                PallasFusedCouplingNet,
            )

            fused_common = dict(
                out_channels=uv2_d,
                num_kernels=kernels,
                num_res_blocks=self.num_res_blocks,
                cardinality=self.cardinality,
                ksize=self.ksize,
                dilations=self.dilations,
                dtype=self.dtype,
            )
            if self.fused_subnet:
                self.net_ab = PallasFusedCouplingNet(n_heads=2, **fused_common)
            else:
                self.net_a = PallasFusedCouplingNet(
                    scale_head=True, **fused_common
                )
                self.net_b = PallasFusedCouplingNet(
                    scale_head=False, **fused_common
                )
        elif self.fused_subnet:
            self.net_ab = ConvCouplingNet(n_heads=2, **common)
        else:
            self.net_a = ConvCouplingNet(scale_head=True, **common)
            self.net_b = ConvCouplingNet(scale_head=False, **common)

    def _coupling_fn(self, u1c):
        if self.fused_subnet:
            return self.net_ab(u1c)
        return self.net_a(u1c), self.net_b(u1c)

    def forward_halves(self, u1c, u2c):
        """The coupling law on ALREADY-COMPRESSED halves: (u1c, u2c) ->
        (v2c, per-sample delta log|det J|). Lets the model skip the
        combine->compress relayout between complementary-mask couplings:
        ``compress(combine(u1c, v2c, m), m') == v2c`` and
        ``compress(combine(u1c, v2c, m), m) == u1c`` exactly, so the full
        tensor between two such layers never needs to be materialized
        (HBM-traffic eliminator; the per-layer protocol itself is
        conv_cINN_make_model.py:1258-1328)."""
        a, b = self._coupling_fn(u1c)
        if self.use_pallas:
            return fused_affine_forward(a, b, u2c)
        return coupling_ops.affine_forward(a, b, u2c)

    def inverse_halves(self, v1c, v2c):
        """Inverse law on compressed halves: (v1c, v2c) -> u2c."""
        a, b = self._coupling_fn(v1c)
        if self.use_pallas:
            return fused_affine_inverse(a, b, v2c)
        return coupling_ops.affine_inverse(a, b, v2c)

    def forward(self, u):
        """u -> (v, per-sample delta log|det J|)."""
        m = self.which_mask
        u1c = mask_ops.compress(u, m)
        u2c = mask_ops.compress(u, mask_ops.COMPLEMENT[m])
        v2c, delta = self.forward_halves(u1c, u2c)
        v = mask_ops.combine(u1c, v2c, m)
        return v, delta

    def inverse(self, v):
        m = self.which_mask
        v1c = mask_ops.compress(v, m)
        v2c = mask_ops.compress(v, mask_ops.COMPLEMENT[m])
        u2c = self.inverse_halves(v1c, v2c)
        return mask_ops.combine(v1c, u2c, m)


def _maybe_squeeze_zy(zy):
    return None if zy is None else squeeze_ops.squeeze(zy)


def _maybe_unsqueeze_zy(zy):
    if zy is None or zy.shape[-1] == 0:
        return zy
    return squeeze_ops.unsqueeze(zy)


class ConvCFlow(nn.Module):
    cfg: ConvFlowConfig

    def setup(self):
        cfg = self.cfg
        blocks = derive_blocks(cfg)
        self.blocks = blocks
        compute_dtype = jnp.dtype(cfg.compute_dtype)

        couplings = []
        plan = []  # static op sequence: ("couple", idx) | ("squeeze",) | ("factor", npf)
        for i, blk in enumerate(blocks):
            for m in BLOCK_MASK_ORDER:
                dil = (
                    blk.dilations_checkerboard
                    if m in (0, 1)
                    else blk.dilations_channelwise
                )
                plan.append(("couple", len(couplings)))
                couplings.append(
                    ConvCouplingLayer(
                        in_shape=blk.io_shape,
                        which_mask=m,
                        num_res_blocks=cfg.res_blocks[i],
                        cardinality=cfg.cardinality[i],
                        num_kernels=cfg.num_kernels[i],
                        ksize=cfg.ksize,
                        dilations=dil,
                        layer_norm=cfg.layer_norm,
                        fused_subnet=cfg.fused_subnet,
                        use_pallas=cfg.use_pallas_coupling,
                        fused_pallas_subnet=cfg.fused_pallas_subnet,
                        ref_compat_group_slice=cfg.ref_compat_group_slice,
                        ref_compat_group_init=cfg.ref_compat_group_init,
                        fuse_dilated_conv=cfg.fuse_dilated_conv,
                        dense_masked_groups=cfg.dense_masked_groups,
                        dtype=compute_dtype,
                        keep_compute_dtype=cfg.flow_in_compute_dtype,
                        late_cast=cfg.late_head_cast,
                    )
                )
            if blk.squeeze_factor:
                plan.append(("squeeze",))
                plan.append(("factor", blk.num_prev_factors))
        self.couplings = couplings
        self.plan = tuple(plan)
        self.sf_plan = tuple(op for op in plan if op[0] != "couple")
        # flow_in_compute_dtype: one entry cast + one exit cast per pass,
        # instead of per-coupling head/law converts
        self.act_dtype = (
            compute_dtype
            if cfg.flow_in_compute_dtype and compute_dtype != jnp.float32
            else None
        )

    def _couple_pairs(self, plan):
        """Static walk of ``plan`` yielding ("pair", i, j) for consecutive
        couplings with COMPLEMENTARY masks and the raw ops otherwise.

        For a pair (mask m then mask m'=COMPLEMENT[m]) the intermediate full
        tensor is redundant: ``compress(combine(u1c, v2c, m), m') == v2c``
        and ``compress(..., m) == u1c`` are exact index identities, so the
        second coupling can consume the first one's compressed halves
        directly — eliminating one combine + two compress relayouts per pair
        (half of all inter-coupling permutation copies under the fixed
        (0,1,2,3) block order, conv_cINN_make_model.py:1545-1550)."""
        out = []
        k = 0
        while k < len(plan):
            op = plan[k]
            nxt = plan[k + 1] if k + 1 < len(plan) else None
            if (
                op[0] == "couple"
                and nxt is not None
                and nxt[0] == "couple"
                and self.couplings[nxt[1]].which_mask
                == mask_ops.COMPLEMENT[self.couplings[op[1]].which_mask]
            ):
                out.append(("pair", op[1], nxt[1]))
                k += 2
            else:
                out.append(op)
                k += 1
        return out

    def forward(self, xy):
        """xy' -> (zy, log_det). zy has the SAME shape as xy; log_det is (B,)."""
        uv = xy if self.act_dtype is None else xy.astype(self.act_dtype)
        zy = None
        log_det = jnp.zeros(xy.shape[:-3], jnp.float32)
        for op in self._couple_pairs(self.plan):
            if op[0] == "pair":
                first, second = self.couplings[op[1]], self.couplings[op[2]]
                m = first.which_mask
                mc = mask_ops.COMPLEMENT[m]
                u1c = mask_ops.compress(uv, m)
                u2c = mask_ops.compress(uv, mc)
                v2c, d1 = first.forward_halves(u1c, u2c)
                # second layer's live half under mask mc IS v2c; its
                # transformed half IS u1c — no combine/compress in between
                w2c, d2 = second.forward_halves(v2c, u1c)
                uv = mask_ops.combine(v2c, w2c, mc)
                log_det = log_det + d1 + d2
            elif op[0] == "couple":
                uv, delta = self.couplings[op[1]].forward(uv)
                log_det = log_det + delta
            elif op[0] == "squeeze":
                uv = squeeze_ops.squeeze(uv)
                zy = _maybe_squeeze_zy(zy)
            else:  # factor
                uv, zy = squeeze_ops.factor_out(uv, zy)

        if not self.sf_plan:
            return uv.astype(jnp.float32), log_det

        # Reshape the flattened latent back to the xy layout by running ONLY
        # the squeeze/factor ops backward (conv_cINN_make_model.py:1754-1771).
        zy = jnp.concatenate([zy, uv], axis=-1)
        vu = None
        for op in reversed(self.sf_plan):
            if op[0] == "factor":
                vu, zy = squeeze_ops.factor_in(vu, zy, op[1])
            else:  # squeeze (backward)
                vu = squeeze_ops.unsqueeze(vu)
                zy = _maybe_unsqueeze_zy(zy)
        return vu.astype(jnp.float32), log_det

    def inverse(self, zy):
        """zy (xy-shaped) -> xy' (conv_cINN_make_model.py:1774-1798)."""
        uv = zy if self.act_dtype is None else zy.astype(self.act_dtype)
        acc = None
        # re-flatten: squeeze/factor ops forward only
        for op in self.sf_plan:
            if op[0] == "squeeze":
                uv = squeeze_ops.squeeze(uv)
                acc = _maybe_squeeze_zy(acc)
            else:
                uv, acc = squeeze_ops.factor_out(uv, acc)
        # all ops backward; consecutive complementary-mask couplings fuse
        # exactly as in forward (the reversed (0,1,2,3) order pairs 3-with-2
        # and 1-with-0)
        for op in self._couple_pairs(tuple(reversed(self.plan))):
            if op[0] == "pair":
                first, second = self.couplings[op[1]], self.couplings[op[2]]
                m = first.which_mask
                mc = mask_ops.COMPLEMENT[m]
                v1c = mask_ops.compress(uv, m)
                v2c = mask_ops.compress(uv, mc)
                u2c = first.inverse_halves(v1c, v2c)
                # intermediate full tensor combine(v1c, u2c, m) is redundant:
                # the next (mask mc) layer's halves are exactly (u2c, v1c)
                t2c = second.inverse_halves(u2c, v1c)
                uv = mask_ops.combine(u2c, t2c, mc)
            elif op[0] == "couple":
                uv = self.couplings[op[1]].inverse(uv)
            elif op[0] == "squeeze":
                uv = squeeze_ops.unsqueeze(uv)
                acc = _maybe_unsqueeze_zy(acc)
            else:  # factor backward: reintegrate d(uv) channels
                uv, acc = squeeze_ops.factor_in(uv, acc, op[1])
        return uv.astype(jnp.float32)

    def __call__(self, xy):
        return self.forward(xy)

    def _loss_components(self, zy, log_det, xy):
        cfg = self.cfg
        y_prime = xy[..., cfg.x_d :]
        z = zy[..., : cfg.x_d]
        y = zy[..., cfg.x_d :]
        ll_z = jnp.sum(standard_normal_logprob(z, axis=-1), axis=(-2, -1))
        ll_y = -cfg.lambda_y * jnp.sum(jnp.abs(y - y_prime), axis=(-3, -2, -1))
        total = -jnp.mean(ll_z + ll_y + log_det)
        return {
            "loss": total,
            "z_loss": -jnp.mean(ll_z),
            "y_loss": -jnp.mean(ll_y),
            "detJ_loss": -jnp.mean(log_det),
        }

    def log_loss(self, xy):
        """Joint NLL + components (conv_cINN_make_model.py:1800-1845).

        ll_z sums the per-pixel N(0,1) log-prob over space; ll_y is the
        lambda_y-weighted L1 between the mapped and requested conditions.
        """
        zy, log_det = self.forward(xy)
        return self._loss_components(zy, log_det, xy)

    def log_loss_with_latent(self, xy):
        """(loss components, zy) from ONE forward pass — for evaluation
        tools that need both the NLL and the encoded latent."""
        zy, log_det = self.forward(xy)
        return self._loss_components(zy, log_det, xy), zy

    def sample_xy(self, z, y):
        """Conditional sampling: build zy from (z, y) and invert
        (TOYcINN.py:438-448 pattern; z has x_d channels per pixel,
        conv_cINN_make_model.py:1619-1623)."""
        zy = jnp.concatenate([z, y], axis=-1)
        return self.inverse(zy)
