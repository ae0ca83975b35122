"""Equivalence tests for the fused-subnet Pallas kernel
(ops.pallas.fused_subnet): same math, same parameter shapes/init as the flax
ConvCouplingNet path — the kernel only changes the lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
from arl_conditional_normalizing_flows_tpu.models.subnets import (
    ConvCouplingNet,
    PallasFusedCouplingNet,
    fused_params_from_flax,
    flax_params_from_fused,
)
from arl_conditional_normalizing_flows_tpu.ops.pallas.fused_subnet import (
    SubnetSpec,
    flax_param_order,
    subnet_apply_pallas,
    subnet_apply_ref,
)

SUBNET_KW = dict(
    out_channels=2,
    num_kernels=16,
    num_res_blocks=2,
    cardinality=2,
    ksize=3,
    dilations=(1, 2),
)


def _nets():
    flax_net = ConvCouplingNet(n_heads=2, layer_norm=False, **SUBNET_KW)
    fused_net = PallasFusedCouplingNet(n_heads=2, **SUBNET_KW)
    return flax_net, fused_net


def test_param_shapes_match_flax(rng):
    """The converter is pure renaming: every flax leaf exists with the same
    shape under the dotted name."""
    flax_net, fused_net = _nets()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 2)), jnp.float32)
    pf = flax_net.init(jax.random.PRNGKey(0), x)["params"]
    pp = fused_net.init(jax.random.PRNGKey(0), x)["params"]
    conv = fused_params_from_flax(pf)
    assert set(conv.keys()) == set(pp.keys())
    for k in conv:
        assert conv[k].shape == pp[k].shape, k
    # round trip
    back = flax_params_from_fused(conv)
    flat_a = jax.tree_util.tree_leaves(back)
    flat_b = jax.tree_util.tree_leaves(pf)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_fused_matches_flax_f32(rng):
    """Transplanted params produce identical (A, b) through the fused math."""
    flax_net, fused_net = _nets()
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 2)), jnp.float32)
    pf = flax_net.init(jax.random.PRNGKey(7), x)["params"]
    # make the tanh scale and biases non-trivial so they are covered
    pf = jax.tree_util.tree_map(
        lambda v: v + 0.01 * np.float32(1.0) if v.ndim == 1 else v, pf
    )
    pf["tanh_scale"] = jnp.asarray(1.3, jnp.float32)
    a0, b0 = flax_net.apply({"params": pf}, x)
    pp = fused_params_from_flax(pf)
    a1, b1 = fused_net.apply({"params": pp}, x)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(b0, b1, atol=2e-5, rtol=2e-5)


def test_pallas_kernel_interpret_matches_ref(rng):
    """The Pallas lowering (interpret mode off-TPU) computes the same values
    as the plain-jnp math."""
    spec = SubnetSpec(
        h=8, w=8, cin=2, kernels=16, res_blocks=1, cardinality=2, ksize=3,
        dilations=(1, 2), out_total=4, compute_dtype="float32", batch_tile=2,
    )
    flat = [
        jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
        for _, shape in flax_param_order(spec)
    ]
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 2)), jnp.float32)
    ref = subnet_apply_ref(spec, x, flat)
    out = subnet_apply_pallas(spec, x, flat, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_flax(rng):
    """custom_vjp backward (jnp-math vjp) equals flax-path gradients after
    parameter-name conversion."""
    flax_net, fused_net = _nets()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 2)), jnp.float32)
    pf = flax_net.init(jax.random.PRNGKey(3), x)["params"]
    pp = fused_params_from_flax(pf)

    def loss_flax(params, x):
        a, b = flax_net.apply({"params": params}, x)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    def loss_fused(params, x):
        a, b = fused_net.apply({"params": params}, x)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    gf = jax.grad(loss_flax)(pf, x)
    gp = jax.grad(loss_fused)(pp, x)
    gf_named = fused_params_from_flax(gf)
    assert set(gf_named.keys()) == set(gp.keys())
    for k in gp:
        np.testing.assert_allclose(
            np.asarray(gf_named[k]), np.asarray(gp[k]), atol=3e-4, rtol=3e-4,
        )


@pytest.mark.parametrize("fused_subnet", [True, False])
def test_full_model_equivalence(rng, fused_subnet):
    """ConvCFlow(experimental_lowering="pallas_subnet") == standard model with transplanted
    params: encode, log-det, decode."""
    arch = dict(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(16, 16), cardinality=(2, 2),
        ksize=3, fused_subnet=fused_subnet,
    )
    m0 = ConvCFlow(ConvFlowConfig(**arch))
    m1 = ConvCFlow(ConvFlowConfig(experimental_lowering="pallas_subnet", **arch))
    xy = jnp.asarray(rng.normal(size=(4, 8, 8, 2)), jnp.float32)
    p0 = m0.init(jax.random.PRNGKey(0), xy)["params"]
    p1 = jax.tree_util.tree_map(
        lambda sub: sub,  # placeholder; converted below
        p0,
        is_leaf=lambda v: False,
    )
    # convert each coupling's net subtree
    p1 = {}
    for cname, sub in p0.items():
        new_sub = {}
        for nname, net_tree in sub.items():
            new_sub[nname] = fused_params_from_flax(net_tree)
        p1[cname] = new_sub
    z0, ld0 = m0.apply({"params": p0}, xy)
    z1, ld1 = m1.apply({"params": p1}, xy)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1),
                               atol=3e-4, rtol=3e-4)
    x0 = m0.apply({"params": p0}, z0, method="inverse")
    x1 = m1.apply({"params": p1}, z1, method="inverse")
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xy),
                               atol=2e-4, rtol=2e-4)


def test_fused_matches_flax_even_ksize(rng):
    """Even kernel sizes need ASYMMETRIC SAME padding (total//2 low,
    rest high) — a symmetric pad computes a different function."""
    kw = dict(SUBNET_KW, ksize=4)
    flax_net = ConvCouplingNet(n_heads=2, layer_norm=False, **kw)
    fused_net = PallasFusedCouplingNet(n_heads=2, **kw)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 2)), jnp.float32)
    pf = flax_net.init(jax.random.PRNGKey(11), x)["params"]
    a0, b0 = flax_net.apply({"params": pf}, x)
    pp = fused_params_from_flax(pf)
    a1, b1 = fused_net.apply({"params": pp}, x)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(b0, b1, atol=2e-5, rtol=2e-5)
