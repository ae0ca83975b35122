"""ref_compat_shared_init: the reference's shared-instance init distribution
(models/init_compat.py; conv_cINN.py:90-91 — one Orthogonal(0.1) instance
reused for every Conv2D, so same shape => identical values; verified on the
transplanted flagship epoch-0 tree, PARITY.md §5)."""

import collections
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arl_conditional_normalizing_flows_tpu.models import (
    ConvCFlow,
    ConvFlowConfig,
)
from arl_conditional_normalizing_flows_tpu.models.init_compat import (
    shared_shape_reinit,
)
from arl_conditional_normalizing_flows_tpu.train import (
    create_train_state,
    make_step_fns,
)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _cfg(**kw):
    base = dict(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(16, 16), cardinality=(2, 2),
        ksize=3, layer_norm=True, ref_compat_shared_init=True,
    )
    base.update(kw)
    return ConvFlowConfig(**base)


@pytest.fixture(scope="module")
def shared_state():
    m = ConvCFlow(_cfg())
    st = create_train_state(m, jnp.zeros((1, 8, 8, 2)), 3e-4, seed=0)
    return m, st


def test_same_shape_kernels_share_one_draw(shared_state):
    _, st = shared_state
    leaves = _flatten(st.params["params"])
    by_shape = collections.defaultdict(list)
    for k, v in leaves.items():
        if k.endswith("/kernel"):
            by_shape[v.shape].append(k)
    multi = 0
    for shape, keys in by_shape.items():
        distinct = []
        for k in keys:
            if not any(np.array_equal(leaves[k], d) for d in distinct):
                distinct.append(leaves[k])
        # direct draws collapse to ONE value; a shape class can also contain
        # group-tiled kernels (a second value) — never more
        assert len(distinct) <= 2, (shape, len(keys), len(distinct))
        if len(keys) > 1:
            multi += 1
        assert len(distinct) < len(keys) or len(keys) == 1
    assert multi > 0  # the model genuinely exercises sharing


def test_grouped_kernels_are_tiled_square_draws(shared_state):
    _, st = shared_state
    leaves = _flatten(st.params["params"])
    grouped = [
        k for k in leaves
        if re.search(r"DilatedResidualBlock_\d+/Conv_1/kernel$", k)
    ]
    assert grouped
    for k in grouped:
        K = leaves[k]
        d, cout = K.shape[2], K.shape[3]
        if cout % d:
            continue  # cardinality-1 fallback: direct draw
        card = cout // d
        blocks = [K[..., g * d:(g + 1) * d] for g in range(card)]
        assert all(np.array_equal(b, blocks[0]) for b in blocks), k
        sv = np.linalg.svd(K.reshape(-1, cout), compute_uv=False)
        # rank d, top singular values 0.1*sqrt(card), rest exactly 0 — the
        # measured structure of the reference's epoch-0 grouped kernels
        assert np.allclose(sv[:d], 0.1 * np.sqrt(card), atol=1e-5), k
        assert np.allclose(sv[d:], 0.0, atol=1e-6), k


def test_seed_changes_draws_deterministically():
    m = ConvCFlow(_cfg())
    base = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    a = _flatten(shared_shape_reinit(base, 0)["params"])
    a2 = _flatten(shared_shape_reinit(base, 0)["params"])
    b = _flatten(shared_shape_reinit(base, 1)["params"])
    some_kernel = next(k for k in a if k.endswith("/kernel"))
    assert np.array_equal(a[some_kernel], a2[some_kernel])
    assert not np.array_equal(a[some_kernel], b[some_kernel])


def test_biases_and_norms_untouched(shared_state):
    _, st = shared_state
    leaves = _flatten(st.params["params"])
    for k, v in leaves.items():
        if k.endswith("/bias"):
            assert np.all(v == 0), k
        if k.endswith("tanh_scale"):
            assert np.allclose(v, 1.0), k


def test_trains_without_nan(shared_state):
    m, st = shared_state
    step, _ = make_step_fns(m, noise_mode="none")
    rng = np.random.default_rng(0)
    for i in range(3):
        xy = jnp.asarray(rng.normal(size=(4, 8, 8, 2)).astype(np.float32))
        st, out = step(st, xy, jax.random.PRNGKey(i), jnp.float32(1.0))
    assert np.isfinite(float(out["loss"]))


def test_fused_head_halves_identical():
    m = ConvCFlow(_cfg(fused_subnet=True))
    st = create_train_state(m, jnp.zeros((1, 8, 8, 2)), 3e-4, seed=0)
    leaves = _flatten(st.params["params"])
    heads = [k for k in leaves if re.search(r"net_ab/Conv_1/kernel$", k)]
    assert heads
    for k in heads:
        K = leaves[k]
        h = K.shape[-1] // 2
        # the reference's separate same-shape A/b heads share one draw
        assert np.array_equal(K[..., :h], K[..., h:]), k


def test_rejects_pallas_and_fused_lowerings():
    # 16x16 so the dilation auto-schedule gives >1 level and the fused
    # lowering actually materializes its masked kernel params
    cfg = _cfg(io_shape=(16, 16, 2), squeeze_factor_blocks=(0,),
               res_blocks=(1,), num_kernels=(16,), cardinality=(2,),
               experimental_lowering="fused_dilated", layer_norm=False)
    m = ConvCFlow(cfg)
    with pytest.raises(ValueError, match="shared_init"):
        create_train_state(m, jnp.zeros((1, 16, 16, 2)), 3e-4, seed=0)


def test_reference_shares_one_draw_per_shape():
    """The empirical basis of this module (PARITY.md §5): the reference's
    driver-style init — ONE Orthogonal(0.1) instance passed to every
    Conv2D — yields identical kernels for every same-shape conv, and each
    grouped conv's groups are identical square blocks. Verified on a small
    live reference model (skipped when the checkout/TF is unavailable)."""
    import os
    import sys

    pytest.importorskip("tensorflow")
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
    )
    sys.path.insert(0, bench)
    from reference_shim import import_conv_reference, reference_available

    if not reference_available():
        pytest.skip("reference checkout unavailable")
    import tensorflow as tf

    cref = import_conv_reference()
    tf.random.set_seed(0)
    m = cref.cFlow(
        io_shape=[8, 8, 2], x_d=1, squeeze_factor_block_list=[0, 1],
        ResNeXt_block_list=[1, 1], num_kernels_list=[16, 16],
        cardinality_list=[2, 2], ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=False,
    )
    kernels = []
    for lay in m.layers_list:
        if not isinstance(lay, cref.coupling_layer):
            continue
        for sub in (lay.model_A, lay.model_b):
            for keras_layer in sub.layers:
                if keras_layer.__class__.__name__ in (
                    "Conv2D", "Convolution2D"
                ):
                    kernels.append(keras_layer.get_weights()[0])
    by_shape = {}
    for k in kernels:
        by_shape.setdefault(k.shape, []).append(k)
    shared = 0
    for shape, ks in by_shape.items():
        if len(ks) < 2:
            continue
        shared += 1
        for k in ks[1:]:
            assert np.array_equal(k, ks[0]), (
                f"reference same-shape kernels differ at {shape} — the "
                "shared-instance premise of ref_compat_shared_init is broken"
            )
    assert shared >= 3  # the premise was actually exercised
