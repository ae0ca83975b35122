"""Dense toy conditional INN (the TPU re-design of
TOYcINN_make_model.py:105-506).

The joint input is ``xy = concat([x, y'])`` with ``x_d`` data dims and
``io_shape - x_d`` condition dims.  ``forward`` encodes xy' -> zy and
accumulates the PER-SAMPLE log|det J| (the toy reference also keeps it
per-sample, TOYcINN_make_model.py:386-387).  ``inverse`` decodes zy -> xy'
with the closed-form elementwise reciprocal — no ``tf.linalg.inv`` linear
solve (cf. TOYcINN_make_model.py:373).

Direction convention vs the reference: our ``forward`` is the reference's
direction −1 (training direction), which iterates the execution order
REVERSED (TOYcINN_make_model.py:299 ``range(N)[::direction]``); ``inverse``
is direction +1.  Layer ``j`` always uses toy mask ``j % 6``; the execution
order is the (possibly shuffled) permutation in ``cfg.ordered_indices()``.
The permutation is part of the model identity and must be checkpointed
(TOYcINN.py:306-317).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from arl_conditional_normalizing_flows_tpu.models.arch import ToyConfig
from arl_conditional_normalizing_flows_tpu.models.subnets import DenseCouplingNet
from arl_conditional_normalizing_flows_tpu.ops import coupling as coupling_ops
from arl_conditional_normalizing_flows_tpu.ops import masks as mask_ops


def standard_normal_logprob(z, axis=-1):
    """log N(z; 0, I) summed over ``axis`` (tfp MultivariateNormalDiag with
    unit scales, TOYcINN_make_model.py:147-149)."""
    d = z.shape[axis]
    return -0.5 * jnp.sum(jnp.square(z), axis=axis) - 0.5 * d * math.log(2.0 * math.pi)


class ToyCINN(nn.Module):
    cfg: ToyConfig

    def setup(self):
        cfg = self.cfg
        self.partitions = [
            mask_ops.toy_partition(cfg.io_shape, j)
            for j in range(cfg.num_coupling_layers)
        ]
        self.couplings = [
            DenseCouplingNet(
                u2_size=len(self.partitions[j][1]),
                intermediate_dims=cfg.intermediate_dims,
                num_layers=cfg.num_layers,
            )
            for j in range(cfg.num_coupling_layers)
        ]

    def _apply_layer(self, j, u, invert):
        u1_idx, u2_idx = self.partitions[j]
        u1 = mask_ops.toy_gather(u, u1_idx)
        u2 = mask_ops.toy_gather(u, u2_idx)
        a, b = self.couplings[j](u1)
        if invert:
            v2 = coupling_ops.affine_inverse(a, b, u2)
            delta = None
        else:
            v2, delta = coupling_ops.affine_forward(a, b, u2)
        v = mask_ops.toy_scatter_combine(u1, v2, u1_idx, u2_idx, self.cfg.io_shape)
        return v, delta

    def forward(self, xy):
        """xy' -> (zy, log_det) with log_det per-sample, shape (B,)."""
        # the index-based masks would silently mis-slice a wider tensor
        assert xy.shape[-1] == self.cfg.io_shape, (
            f"expected io_shape={self.cfg.io_shape} features, got {xy.shape[-1]}"
        )
        u = xy
        log_det = jnp.zeros(xy.shape[:-1], xy.dtype)
        for j in reversed(self.cfg.ordered_indices()):
            u, delta = self._apply_layer(j, u, invert=False)
            log_det = log_det + delta
        return u, log_det

    def inverse(self, zy):
        """zy -> xy' (the reference's direction +1, TOYcINN_make_model.py:299)."""
        assert zy.shape[-1] == self.cfg.io_shape, (
            f"expected io_shape={self.cfg.io_shape} features, got {zy.shape[-1]}"
        )
        v = zy
        for j in self.cfg.ordered_indices():
            v, _ = self._apply_layer(j, v, invert=True)
        return v

    def __call__(self, xy):
        return self.forward(xy)

    def log_loss(self, xy):
        """Joint NLL and its components (TOYcINN_make_model.py:404-451).

        Returns dict(loss, z_loss, y_loss, detJ_loss) — each the batch mean of
        the negative component, matching the reference's four Mean trackers.
        """
        cfg = self.cfg
        y_prime = xy[..., cfg.x_d :]
        zy, log_det = self.forward(xy)
        z = zy[..., : cfg.x_d]
        y = zy[..., cfg.x_d :]
        ll_z = standard_normal_logprob(z)
        ll_y = -cfg.lambda_y * jnp.sum(jnp.abs(y - y_prime), axis=-1)
        total = -jnp.mean(ll_z + ll_y + log_det)
        return {
            "loss": total,
            "z_loss": -jnp.mean(ll_z),
            "y_loss": -jnp.mean(ll_y),
            "detJ_loss": -jnp.mean(log_det),
        }
