"""Reference-faithful shared-shape initialization for the conv flow.

The reference driver creates ONE ``tf.keras.initializers.Orthogonal(0.1)``
INSTANCE and passes it to every Conv2D in the model (conv_cINN.py:90-91 ->
conv_cINN_make_model.py:1119 -> conv_cINN_base_functions.py:415-498). TF2
Keras initializer instances are stateless: the same instance called twice
with the same shape returns the SAME values. The reference's true epoch-0
distribution is therefore NOT hundreds of independent orthogonal draws — it
is ONE orthogonal draw per UNIQUE kernel shape, replicated across every
conv layer of that shape, and (because each group of a grouped convolution
is its own square Conv2D, conv_cINN_base_functions.py:399-411) replicated
across the groups of every grouped conv.

Measured on the transplanted flagship epoch-0 tree
(tools/init_probe_blocks.py): within every kernel-shape class all reference
kernels are bit-identical, and every grouped kernel is ``cardinality``
copies of one square orthogonal block (rank d, singular values
0.1*sqrt(cardinality) instead of uniformly 0.1).

This is the init-family difference behind the flagship-600 tail offset
(PARITY.md §5): ours trained from the reference's exact epoch-0 weights
reaches the reference band while independent-draw inits (default and
per-group ``ref_compat_group_init``) do not.

``shared_shape_reinit`` rewrites a freshly initialized ``ConvCFlow`` param
tree into this distribution: deterministic in ``seed``, one draw per unique
shape memoized across the whole tree, grouped kernels tiled from the square
per-group draw, fused two-headed nets tiled from the single-head draw (the
reference's two same-shape heads share one draw). Enabled by
``ConvFlowConfig.ref_compat_shared_init`` and applied automatically by
``train.create_train_state``.
"""

from __future__ import annotations

import re
import zlib

import jax
import jax.numpy as jnp
import flax.linen as nn

_GROUPED_RE = re.compile(r"DilatedResidualBlock_\d+$")
_TRUNK_HEAD_RE = re.compile(r"net_(a|b|ab)$")


def _shape_key(base_key, shape):
    """Deterministic per-shape key — the analogue of the Keras instance's
    fixed internal seed: same shape => same draw, anywhere in the model."""
    h = zlib.crc32(repr(tuple(int(s) for s in shape)).encode()) & 0x7FFFFFFF
    return jax.random.fold_in(base_key, h)


class _ShapeMemo:
    def __init__(self, seed: int, scale: float):
        # a dedicated stream, unrelated to the flax init stream we overwrite
        self.base = jax.random.fold_in(jax.random.PRNGKey(seed), 0x0C0FFEE)
        self.ortho = nn.initializers.orthogonal(scale=scale)
        self.cache = {}

    def draw(self, shape):
        shape = tuple(int(s) for s in shape)
        if shape not in self.cache:
            self.cache[shape] = self.ortho(
                _shape_key(self.base, shape), shape, jnp.float32
            )
        # fresh buffer per use: leaves must not alias (donated train steps
        # reject the same buffer appearing twice in the argument tree)
        return jnp.array(self.cache[shape], copy=True)


def _rewrite_net(net: dict, memo: _ShapeMemo, n_heads: int) -> dict:
    """Rewrite one ConvCouplingNet subtree (net_a / net_b / net_ab)."""
    out = {}
    for name, sub in net.items():
        if _GROUPED_RE.search(name):
            blk = dict(sub)
            convs = sorted(
                (k for k in blk if k.startswith("Conv_")),
                key=lambda k: int(k.split("_")[1]),
            )
            unknown = [
                k for k in blk
                if not k.startswith(("Conv_", "FlatLayerNorm", "LayerNorm"))
            ]
            if unknown:
                raise ValueError(
                    "ref_compat_shared_init supports the standard "
                    f"ConvCouplingNet lowering only; found {unknown} in a "
                    "residual block (disable fuse_dilated_conv/"
                    "dense_masked_groups/pallas lowerings)"
                )
            # Conv_0 and Conv_{last} are the 1x1 bottlenecks (direct draws);
            # Conv_1..Conv_{last-1} are the grouped dilated branches
            for idx, ck in enumerate(convs):
                kern = blk[ck]["kernel"]
                if idx in (0, len(convs) - 1) or kern.shape[3] % kern.shape[2]:
                    # 1x1 bottlenecks — and the cardinality==1 branch, which
                    # the reference lowers as a standard full-input Conv2D
                    # (conv_cINN_base_functions.py:388-394): direct draws
                    new = memo.draw(kern.shape)
                else:
                    k0, k1, cin, cout = kern.shape
                    card = cout // cin
                    # the reference's per-group Conv2D is SQUARE (d -> d);
                    # all groups share the one (k,k,d,d) draw
                    new = jnp.tile(memo.draw((k0, k1, cin, cin)), (1, 1, 1, card))
                blk[ck] = dict(blk[ck], kernel=new)
            out[name] = blk
        elif name.startswith("Conv_"):
            kern = sub["kernel"]
            if name == "Conv_1" and n_heads == 2:
                # fused A/b head: the reference's two separate same-shape
                # heads get the same instance draw => tile the single-head
                # draw across both halves
                k0, k1, cin, cout2 = kern.shape
                assert cout2 % 2 == 0, kern.shape
                half = memo.draw((k0, k1, cin, cout2 // 2))
                new = jnp.concatenate([half, half], axis=-1)
            else:
                new = memo.draw(kern.shape)
            out[name] = dict(sub, kernel=new)
        else:
            out[name] = sub  # LayerNorm / tanh_scale: deterministic inits
    return out


def shared_shape_reinit(params: dict, seed: int, scale: float = 0.1) -> dict:
    """Return a copy of a ``ConvCFlow`` param tree whose conv kernels follow
    the reference's shared-instance init distribution (see module doc).

    Biases, LayerNorm scales, and tanh scales are untouched (deterministic
    zeros/ones in both frameworks). Deterministic in ``seed``.
    """
    tree = params["params"] if "params" in params else params
    memo = _ShapeMemo(seed, scale)
    new_tree = {}
    for cname, coupling in tree.items():
        if not cname.startswith("couplings_"):
            new_tree[cname] = coupling
            continue
        lay = {}
        for nname, net in coupling.items():
            if _TRUNK_HEAD_RE.search(nname):
                if not isinstance(net, dict) or any(
                    "." in k for k in net
                ):
                    raise ValueError(
                        "ref_compat_shared_init supports the flax "
                        "ConvCouplingNet parameterization only (not the "
                        "Pallas fused-subnet flat tree)"
                    )
                lay[nname] = _rewrite_net(
                    net, memo, n_heads=2 if nname == "net_ab" else 1
                )
            else:
                lay[nname] = net
        new_tree[cname] = lay
    return {"params": new_tree} if "params" in params else new_tree
