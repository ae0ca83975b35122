"""AOT export (serving artifact) tests: exported StableHLO must reproduce the
live model to float32 ULP noise (the AOT pipeline fuses slightly
differently), survive a serialize/deserialize round-trip, and serve any batch
size via the symbolic batch dimension."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.models import (
    ConvCFlow,
    ConvFlowConfig,
    ToyCINN,
    ToyConfig,
)
from arl_conditional_normalizing_flows_tpu.serve import (
    export_sampler,
    load_artifact,
    make_image_serving_fn,
    make_toy_serving_fn,
    save_artifact,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _toy():
    cfg = ToyConfig(num_coupling_layers=4, intermediate_dims=8, num_layers=1)
    model = ToyCINN(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    return model, params, cfg


def _conv():
    cfg = ConvFlowConfig(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(8, 8), cardinality=(2, 2), ksize=3,
    )
    model = ConvCFlow(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    return model, params, cfg


def test_toy_export_matches_live_model(rng, tmp_path):
    model, params, _ = _toy()
    fn = make_toy_serving_fn(model, params, x_d=2)
    exported = export_sampler(fn, [(2,), (1,)])

    z = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32))
    live = fn(z, y)
    aot = exported.call(z, y)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live), rtol=1e-6, atol=1e-6)

    # round-trip through disk
    path = os.path.join(tmp_path, "toy_sampler.shlo")
    side = save_artifact(path, exported, metadata={"kind": "toy"})
    assert side["nr_bytes"] > 0 and os.path.exists(path + ".json")
    loaded = load_artifact(path)
    np.testing.assert_allclose(np.asarray(loaded.call(z, y)), np.asarray(live), rtol=1e-6, atol=1e-6)


def test_toy_export_symbolic_batch_serves_any_size(rng):
    model, params, _ = _toy()
    fn = make_toy_serving_fn(model, params, x_d=2)
    exported = export_sampler(fn, [(2,), (1,)])
    for b in (1, 5, 32):
        z = jnp.asarray(rng.normal(size=(b, 2)).astype(np.float32))
        y = jnp.zeros((b, 1), jnp.float32)
        out = exported.call(z, y)
        assert out.shape == (b, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(fn(z, y)), rtol=1e-6, atol=1e-6)


def test_conv_export_matches_live_model(rng, tmp_path):
    model, params, cfg = _conv()
    fn = make_image_serving_fn(model, params, cfg.x_d, de_logit=True)
    h, w, _ = cfg.io_shape
    exported = export_sampler(fn, [(h, w, 1), (h, w, 1)])

    z = jnp.asarray(rng.normal(size=(4, h, w, 1)).astype(np.float32))
    y = jnp.full((4, h, w, 1), 0.5, jnp.float32)
    live = fn(z, y)
    aot = exported.call(z, y)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live), rtol=1e-6, atol=1e-6)

    path = os.path.join(tmp_path, "conv_sampler.shlo")
    save_artifact(path, exported)
    loaded = load_artifact(path)
    out2 = loaded.call(jnp.concatenate([z, z]), jnp.concatenate([y, y]))
    assert out2.shape == (8, h, w, 1)  # symbolic batch
    np.testing.assert_allclose(np.asarray(out2[:4]), np.asarray(live), rtol=1e-6, atol=1e-6)


def test_conv_export_residual_reconstruction(rng):
    model, params, cfg = _conv()
    fn = make_image_serving_fn(model, params, cfg.x_d, residual=True)
    h, w, _ = cfg.io_shape
    exported = export_sampler(fn, [(h, w, 1), (h, w, 1)], symbolic_batch=False)
    z = jnp.asarray(rng.normal(size=(1, h, w, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, h, w, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(exported.call(z, y)), np.asarray(fn(z, y)),
        rtol=1e-6, atol=1e-6,
    )


def test_multi_platform_export_from_cpu(rng, tmp_path):
    """One artifact lowered for BOTH tpu and cpu, produced without a TPU
    attached (cross-platform lowering), still callable on the cpu backend."""
    model, params, cfg = _conv()
    fn = make_image_serving_fn(model, params, cfg.x_d)
    h, w, _ = cfg.io_shape
    exported = export_sampler(fn, [(h, w, 1), (h, w, 1)], platforms=("tpu", "cpu"))
    assert exported.platforms == ("tpu", "cpu")
    path = os.path.join(tmp_path, "mp.shlo")
    save_artifact(path, exported)
    loaded = load_artifact(path)
    z = jnp.asarray(rng.normal(size=(2, h, w, 1)).astype(np.float32))
    y = jnp.zeros((2, h, w, 1), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.call(z, y)), np.asarray(fn(z, y)), rtol=1e-6, atol=1e-6
    )


def test_multidraw_matches_repeated_single_draw(rng, tmp_path):
    """The multi-draw entry (one call -> D batched draws, VERDICT r2 #3) must
    equal D independent single-draw calls, round-trip through disk, and serve
    any (d, b) via the doubly-symbolic export."""
    from arl_conditional_normalizing_flows_tpu.serve import (
        export_multidraw_sampler,
        make_multidraw_fn,
    )

    model, params, cfg = _conv()
    fn = make_image_serving_fn(model, params, cfg.x_d)
    h, w, _ = cfg.io_shape

    d, b = 3, 4
    z = jnp.asarray(rng.normal(size=(d, b, h, w, 1)).astype(np.float32))
    y = jnp.full((b, h, w, 1), 0.5, jnp.float32)

    multi = make_multidraw_fn(fn)
    out = multi(z, y)
    assert out.shape == (d, b, h, w, 1)
    for i in range(d):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(fn(z[i], y)), rtol=1e-6, atol=1e-6
        )

    exported = export_multidraw_sampler(fn, (h, w, 1), (h, w, 1))
    path = os.path.join(tmp_path, "multidraw.shlo")
    save_artifact(path, exported, metadata={"entry": "multidraw"})
    loaded = load_artifact(path)
    np.testing.assert_allclose(
        np.asarray(loaded.call(z, y)), np.asarray(out), rtol=1e-6, atol=1e-6
    )
    # any other (d, b) from the same artifact
    z2 = jnp.asarray(rng.normal(size=(7, 2, h, w, 1)).astype(np.float32))
    y2 = jnp.zeros((2, h, w, 1), jnp.float32)
    assert loaded.call(z2, y2).shape == (7, 2, h, w, 1)


def test_multidraw_toy(rng):
    from arl_conditional_normalizing_flows_tpu.serve import (
        export_multidraw_sampler,
    )

    model, params, _ = _toy()
    fn = make_toy_serving_fn(model, params, x_d=2)
    exported = export_multidraw_sampler(fn, (2,), (1,))
    z = jnp.asarray(rng.normal(size=(5, 8, 2)).astype(np.float32))
    y = jnp.full((8, 1), -0.3, jnp.float32)
    out = np.asarray(exported.call(z, y))
    assert out.shape == (5, 8, 3)
    for i in range(5):
        np.testing.assert_allclose(
            out[i], np.asarray(fn(z[i], y)), rtol=1e-6, atol=1e-6
        )


def test_seeded_multidraw_and_uint8(rng, tmp_path):
    """Device-side latent draw (one int32 seed on the wire) + uint8 payload:
    deterministic per seed, distinct across seeds, quantization consistent
    with the float32 entry."""
    from arl_conditional_normalizing_flows_tpu.serve import (
        export_seeded_multidraw_sampler,
        make_seeded_multidraw_fn,
    )

    model, params, cfg = _conv()
    h, w, _ = cfg.io_shape
    fn_f32 = make_image_serving_fn(model, params, cfg.x_d, de_logit=True)
    fn_u8 = make_image_serving_fn(
        model, params, cfg.x_d, de_logit=True, quantize_uint8=True
    )

    y = jnp.full((5, h, w, 1), 0.5, jnp.float32)
    g = make_seeded_multidraw_fn(fn_u8, draws=3, z_shape=(h, w, 1))
    out1 = np.asarray(g(jnp.int32(7), y))
    out2 = np.asarray(g(jnp.int32(7), y))
    out3 = np.asarray(g(jnp.int32(8), y))
    assert out1.shape == (3, 5, h, w, 1) and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)  # deterministic per seed
    assert not np.array_equal(out1, out3)  # seeds differ

    # quantization agrees with the f32 entry at the same latents
    z = jax.random.normal(jax.random.PRNGKey(7), (3, 5, h, w, 1), jnp.float32)
    xf = np.asarray(fn_f32(z[0], y))
    xu = np.asarray(fn_u8(z[0], y))
    np.testing.assert_array_equal(
        xu, np.round(np.clip(xf, 0, 1) * 255).astype(np.uint8)
    )

    # exported artifact round-trips and keeps symbolic batch
    exported = export_seeded_multidraw_sampler(fn_u8, 3, (h, w, 1), (h, w, 1))
    path = os.path.join(tmp_path, "seeded.shlo")
    save_artifact(path, exported, metadata={"entry": "seeded_multidraw"})
    loaded = load_artifact(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.call(jnp.int32(7), y)), out1
    )
    y2 = jnp.zeros((2, h, w, 1), jnp.float32)
    assert loaded.call(jnp.int32(0), y2).shape == (3, 2, h, w, 1)


def test_pipelined_sampler_matches_sequential(rng):
    """PipelinedSampler must produce EXACTLY the sequential per-seed chunks
    regardless of thread scheduling (deterministic seeded artifact)."""
    from arl_conditional_normalizing_flows_tpu.serve import (
        PipelinedSampler,
        export_seeded_multidraw_sampler,
    )

    model, params, cfg = _conv()
    h, w, _ = cfg.io_shape
    fn = make_image_serving_fn(model, params, cfg.x_d, quantize_uint8=True)
    d = 2
    exported = export_seeded_multidraw_sampler(fn, d, (h, w, 1), (h, w, 1))
    y = jnp.full((3, h, w, 1), 0.5, jnp.float32)

    sampler = PipelinedSampler(exported, draws_per_call=d, n_in_flight=3)
    out = sampler.sample(y, total_draws=7, start_seed=5)  # 4 calls, 8 draws
    assert out.shape == (8, 3, h, w, 1) and out.dtype == np.uint8

    seq = np.concatenate(
        [np.asarray(exported.call(jnp.int32(5 + k), y)) for k in range(4)],
        axis=0,
    )
    np.testing.assert_array_equal(out, seq)
