"""squeeze/factor, resampling, logit, noise and coupling-law unit tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.ops import (
    coupling,
    logit,
    noise,
    resample,
    squeeze,
)


def test_squeeze_matches_space_to_depth_semantics(rng):
    # out[b, i, j, (dy*2+dx)*D + d] == in[b, 2i+dy, 2j+dx, d]
    x = rng.normal(size=(2, 4, 6, 3)).astype(np.float32)
    out = np.asarray(squeeze.squeeze(jnp.asarray(x)))
    assert out.shape == (2, 2, 3, 12)
    for dy in range(2):
        for dx in range(2):
            for d in range(3):
                c = (dy * 2 + dx) * 3 + d
                np.testing.assert_array_equal(
                    out[..., c], x[:, dy::2, dx::2, d]
                )


def test_squeeze_unsqueeze_roundtrip(rng):
    x = rng.normal(size=(3, 8, 8, 2)).astype(np.float32)
    y = squeeze.unsqueeze(squeeze.squeeze(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_factor_out_in_roundtrip(rng):
    u = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    v, zy = squeeze.factor_out(u, None)
    assert v.shape[-1] == 4 and zy.shape[-1] == 4
    # factor_in with v given reintegrates d(v) channels in front
    back, rest = squeeze.factor_in(v, zy, num_prev_factors=0)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u))
    assert rest.shape[-1] == 0


def test_factor_in_all_zy_split_rule(rng):
    # v=None: split = zy_d // 2**num_prev_factors (conv_cINN_make_model.py:316-321)
    zy = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    u, rest = squeeze.factor_in(None, zy, num_prev_factors=1)
    assert u.shape[-1] == 4 and rest.shape[-1] == 4
    np.testing.assert_array_equal(np.asarray(u), np.asarray(zy[..., 4:]))


def test_down_is_2x2_block_mean(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    got = np.asarray(resample.down(jnp.asarray(x)))
    want = x.reshape(2, 2, 2, 2, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_up_is_nearest_repeat(rng):
    x = rng.normal(size=(1, 2, 2, 1)).astype(np.float32)
    got = np.asarray(resample.up(jnp.asarray(x)))
    assert got.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(got[0, :2, :2, 0], np.full((2, 2), x[0, 0, 0, 0]))


def test_up_down_identity(rng):
    x = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    got = np.asarray(resample.down(resample.up(jnp.asarray(x))))
    np.testing.assert_allclose(got, x, rtol=1e-6)


def test_logit_roundtrip_and_range(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(100,)).astype(np.float32))
    z = logit.logitify(x)
    assert float(z.min()) >= -1e-5 and float(z.max()) <= 1.0 + 1e-5
    back = logit.de_logitify(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # endpoints map to exactly 0 / 1
    np.testing.assert_allclose(
        np.asarray(logit.logitify(jnp.array([0.0, 1.0]))), [0.0, 1.0], atol=1e-6
    )


def test_affine_forward_inverse(rng):
    a = jnp.asarray(np.tanh(rng.normal(size=(4, 3, 3, 2))).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 3, 3, 2)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(4, 3, 3, 2)).astype(np.float32))
    v2, delta = coupling.affine_forward(a, b, u2)
    assert delta.shape == (4,)
    np.testing.assert_allclose(
        np.asarray(delta), np.asarray(a).sum(axis=(1, 2, 3)), rtol=1e-5
    )
    back = coupling.affine_inverse(a, b, v2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u2), rtol=2e-5, atol=1e-6)


def test_instance_noise_alpha_endpoints(rng):
    key = jax.random.PRNGKey(0)
    xy = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(noise.instance_noise(key, xy, 1.0)), np.asarray(xy), atol=1e-7
    )
    pure = noise.instance_noise(key, xy, 0.0)
    eps = jax.random.normal(key, xy.shape, xy.dtype)
    np.testing.assert_allclose(np.asarray(pure), np.asarray(eps), atol=1e-7)


def test_instance_noise_x_only_leaves_y(rng):
    key = jax.random.PRNGKey(1)
    xy = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    out = noise.instance_noise_x_only(key, xy, 0.3, x_d=2)
    np.testing.assert_array_equal(np.asarray(out[:, 2]), np.asarray(xy[:, 2]))
    assert not np.allclose(np.asarray(out[:, :2]), np.asarray(xy[:, :2]))


def test_instance_noise_x_only_requires_x_d(rng):
    """x_d=None would make both slices the full tensor and silently double
    the feature width — must be rejected (and the train-loop builders must
    reject noise_mode='x_only' without x_d)."""
    key = jax.random.PRNGKey(1)
    xy = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    with pytest.raises(AssertionError):
        noise.instance_noise_x_only(key, xy, 0.3, x_d=None)
    with pytest.raises(AssertionError):
        noise.instance_noise_x_only(key, xy, 0.3, x_d=3)

    from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    cfg = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
    model = ToyCINN(cfg)
    state = create_train_state(model, jnp.zeros((1, 3)), 1e-3)
    step, _ = make_step_fns(model, noise_mode="x_only")  # x_d omitted
    with pytest.raises(AssertionError):
        step(state, xy, key, jnp.float32(0.5))


def test_toy_model_rejects_wrong_width(rng):
    from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig

    cfg = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
    model = ToyCINN(cfg)
    import jax as _jax

    params = model.init(_jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    wide = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    with pytest.raises(AssertionError):
        model.apply(params, wide)


def test_annealing_alphas():
    a = noise.annealing_alphas(10)
    np.testing.assert_allclose(a, np.arange(10) / 10.0)
