"""Fused Pallas coupling kernels vs the jnp reference path, run in the
Pallas interpreter on CPU (real-TPU execution is covered by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.ops import coupling
from arl_conditional_normalizing_flows_tpu.ops.pallas import affine_coupling as ac


@pytest.fixture
def interpret():
    ac.INTERPRET = True
    yield
    ac.INTERPRET = False


@pytest.mark.parametrize("shape", [(8, 4, 4, 2), (16, 14, 14, 2), (3, 5, 7, 3)])
def test_fused_forward_matches_reference(rng, interpret, shape):
    a = jnp.asarray(np.tanh(rng.normal(size=shape)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v2, ld = ac.fused_affine_forward(a, b, u2)
    v2_ref, ld_ref = coupling.affine_forward(a, b, u2)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v2_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 4, 4, 2), (3, 5, 7, 3)])
def test_fused_inverse_matches_reference(rng, interpret, shape):
    a = jnp.asarray(np.tanh(rng.normal(size=shape)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    u2 = ac.fused_affine_inverse(a, b, v2)
    u2_ref = coupling.affine_inverse(a, b, v2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u2_ref), rtol=1e-6, atol=1e-6)


def test_fused_roundtrip(rng, interpret):
    shape = (8, 6, 6, 2)
    a = jnp.asarray(np.tanh(rng.normal(size=shape)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v2, _ = ac.fused_affine_forward(a, b, u2)
    back = ac.fused_affine_inverse(a, b, v2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u2), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_reference(rng, interpret):
    shape = (8, 4, 4, 2)
    a = jnp.asarray(np.tanh(rng.normal(size=shape)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_fused(a, b, u2):
        v2, ld = ac.fused_affine_forward(a, b, u2)
        return jnp.sum(v2**2) + 2.0 * jnp.sum(ld)

    def loss_ref(a, b, u2):
        v2, ld = coupling.affine_forward(a, b, u2)
        return jnp.sum(v2**2) + 2.0 * jnp.sum(ld)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(a, b, u2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(a, b, u2)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_conv_model_pallas_flag_roundtrip(rng, interpret):
    import dataclasses

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig

    cfg = ConvFlowConfig(
        io_shape=(4, 4, 2),
        x_d=1,
        squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1),
        num_kernels=(8, 8),
        cardinality=(2, 2),
        experimental_lowering="pallas_coupling",
    )
    model = ConvCFlow(cfg)
    xy = jnp.asarray(rng.normal(size=(8, 4, 4, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), xy)
    zy, ld = model.apply(params, xy)
    back = model.apply(params, zy, method="inverse")
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)

    # same params, pallas off -> identical forward
    cfg2 = dataclasses.replace(cfg, experimental_lowering=None)
    zy2, ld2 = ConvCFlow(cfg2).apply(params, xy)
    np.testing.assert_allclose(np.asarray(zy), np.asarray(zy2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld2), rtol=1e-5, atol=1e-5)


def test_fused_affine_partial_grid_tile_logdet(rng):
    """Feature sizes above FEAT_TILE that are not a multiple of it must pad
    to full grid blocks — a partial last block summed out-of-bounds garbage
    into the log-det before the fix."""
    from arl_conditional_normalizing_flows_tpu.ops import coupling as ref
    from arl_conditional_normalizing_flows_tpu.ops import pallas as pk
    from arl_conditional_normalizing_flows_tpu.ops.pallas import affine_coupling

    old = affine_coupling.INTERPRET
    affine_coupling.INTERPRET = True
    try:
        a, b, u2 = (
            jnp.asarray(rng.normal(size=(4, 1280)), jnp.float32) for _ in range(3)
        )
        v2, ld = pk.fused_affine_forward(a, b, u2)
        v2r, ldr = ref.affine_forward(a, b, u2)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v2r), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ldr), rtol=1e-4, atol=1e-4)
        u2b = pk.fused_affine_inverse(a, b, v2)
        np.testing.assert_allclose(np.asarray(u2b), np.asarray(u2), rtol=1e-4, atol=1e-4)
    finally:
        affine_coupling.INTERPRET = old


def test_fused_affine_logdet_f32_accumulation(rng):
    """bf16 inputs still accumulate the log-det in float32."""
    from arl_conditional_normalizing_flows_tpu.ops.pallas import affine_coupling

    old = affine_coupling.INTERPRET
    affine_coupling.INTERPRET = True
    try:
        a = jnp.asarray(rng.normal(size=(2, 256)), jnp.bfloat16)
        b = jnp.zeros_like(a)
        u2 = jnp.zeros_like(a)
        _, ld = affine_coupling.fused_affine_forward(a, b, u2)
        assert ld.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(ld),
            np.asarray(a.astype(jnp.float32)).sum(-1),
            rtol=1e-3, atol=1e-3,
        )
    finally:
        affine_coupling.INTERPRET = old
