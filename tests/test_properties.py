"""Property-based tests (hypothesis) for the pure ops.

Generative coverage of the exact-inverse contracts that the fixed-case unit
tests pin at single shapes: mask compress/combine, squeeze/factor, logit,
resampling, toy gather/scatter. All ops are bit-exact rearrangements (or
algebraic inverses), so tolerances are 0 (or float-noise for logit).
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from arl_conditional_normalizing_flows_tpu.ops import masks, squeeze as squeeze_ops
from arl_conditional_normalizing_flows_tpu.ops.logit import de_logitify, logitify
from arl_conditional_normalizing_flows_tpu.ops.resample import down, up

SETTINGS = dict(max_examples=20, deadline=None)


def _arr(rng_seed, shape):
    return jnp.asarray(
        np.random.default_rng(rng_seed).normal(size=shape).astype(np.float32)
    )


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 3),
    h2=st.integers(1, 5),
    w2=st.integers(1, 5),
    d=st.integers(1, 7),
    m=st.sampled_from([0, 1, 2, 3]),
)
def test_mask_compress_combine_roundtrip(seed, b, h2, w2, d, m):
    uv = _arr(seed, (b, 2 * h2, 2 * w2, d))
    u1 = masks.compress(uv, m)
    u2 = masks.compress(uv, masks.COMPLEMENT[m])
    assert u1.shape[1:] == masks.compressed_shape(uv.shape[1:], m)
    back = masks.combine(u1, u2, m)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(uv))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 3),
    h2=st.integers(1, 5),
    w2=st.integers(1, 5),
    d=st.integers(1, 7),
    m=st.sampled_from([0, 1, 2, 3]),
)
def test_zero_masked_halves_sum_to_identity(seed, b, h2, w2, d, m):
    uv = _arr(seed, (b, 2 * h2, 2 * w2, d))
    a = masks.zero_masked(uv, m)
    bb = masks.zero_masked(uv, masks.COMPLEMENT[m])
    np.testing.assert_array_equal(np.asarray(a + bb), np.asarray(uv))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 3),
    h2=st.integers(1, 5),
    w2=st.integers(1, 5),
    d=st.integers(1, 6),
)
def test_squeeze_unsqueeze_roundtrip(seed, b, h2, w2, d):
    u = _arr(seed, (b, 2 * h2, 2 * w2, d))
    v = squeeze_ops.squeeze(u)
    assert v.shape == (b, h2, w2, 4 * d)
    np.testing.assert_array_equal(np.asarray(squeeze_ops.unsqueeze(v)), np.asarray(u))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 3),
    h=st.integers(1, 6),
    d2=st.integers(1, 6),
    with_prior_zy=st.booleans(),
)
def test_factor_out_in_roundtrip(seed, b, h, d2, with_prior_zy):
    u = _arr(seed, (b, h, h, 2 * d2))
    zy0 = _arr(seed + 1, (b, h, h, 3)) if with_prior_zy else None
    v, zy = squeeze_ops.factor_out(u, zy0)
    u_back, zy_back = squeeze_ops.factor_in(v, zy, num_prev_factors=0)
    np.testing.assert_array_equal(np.asarray(u_back), np.asarray(u))
    if with_prior_zy:
        np.testing.assert_array_equal(np.asarray(zy_back), np.asarray(zy0))
    else:
        assert zy_back.shape[-1] == 0


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    a=st.floats(1e-3, 0.2),
)
def test_logit_roundtrip(seed, a):
    x = jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, size=(4, 8, 8, 1)).astype(np.float32)
    )
    z = logitify(x, a)
    assert float(z.min()) >= -1e-5 and float(z.max()) <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(de_logitify(z, a)), np.asarray(x), atol=2e-5)


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 3),
    h=st.integers(1, 6),
    d=st.integers(1, 3),
)
def test_down_up_identity(seed, b, h, d):
    img = _arr(seed, (b, h, h, d))
    np.testing.assert_allclose(
        np.asarray(down(up(img))), np.asarray(img), rtol=1e-6, atol=1e-6
    )


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), m=st.sampled_from(list(range(6))))
def test_toy_mask_roundtrip(seed, m):
    u = _arr(seed, (5, 3))
    u1_idx, u2_idx = masks.toy_partition(3, m)
    u1 = masks.toy_gather(u, u1_idx)
    u2 = masks.toy_gather(u, u2_idx)
    back = masks.toy_scatter_combine(u1, u2, u1_idx, u2_idx, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    b=st.integers(1, 4),
    shape_nd=st.sampled_from(["vec", "img"]),
)
def test_affine_coupling_law_roundtrip_and_logdet(seed, b, shape_nd):
    from arl_conditional_normalizing_flows_tpu.ops.coupling import (
        affine_forward,
        affine_inverse,
    )

    rng = np.random.default_rng(seed)
    shape = (b, 5) if shape_nd == "vec" else (b, 3, 4, 2)
    a = jnp.asarray(np.tanh(rng.normal(size=shape)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v2, delta = affine_forward(a, bb, u2)
    assert delta.shape == (b,)
    # per-sample log-det is exactly sum(a) over non-batch axes
    np.testing.assert_allclose(
        np.asarray(delta),
        np.asarray(a).reshape(b, -1).sum(-1),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(affine_inverse(a, bb, v2)), np.asarray(u2), rtol=2e-5, atol=2e-5
    )


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    alpha=st.floats(0.0, 1.0),
    x_d=st.integers(1, 2),
)
def test_instance_noise_properties(seed, alpha, x_d):
    import jax

    from arl_conditional_normalizing_flows_tpu.ops.noise import (
        instance_noise,
        instance_noise_x_only,
    )

    xy = _arr(seed, (6, 3))
    key = jax.random.PRNGKey(seed)
    full = instance_noise(key, xy, jnp.float32(alpha))
    xo = instance_noise_x_only(key, xy, jnp.float32(alpha), x_d)
    # y-columns stay untouched in the toy variant at every alpha
    np.testing.assert_array_equal(np.asarray(xo[..., x_d:]), np.asarray(xy[..., x_d:]))
    # full variant mixes every column toward N(0,1) noise: at alpha<1 the
    # y-columns must differ from the toy variant's untouched ones
    if alpha < 0.99:  # away from 1, where the noise term is resolvable
        assert not np.allclose(np.asarray(full[..., x_d:]), np.asarray(xy[..., x_d:]))
    # alpha=1 is the identity for both variants — checked unconditionally
    # (a conditional on the drawn alpha would only run when hypothesis
    # happens to generate exactly 1.0)
    full1 = instance_noise(key, xy, jnp.float32(1.0))
    xo1 = instance_noise_x_only(key, xy, jnp.float32(1.0), x_d)
    np.testing.assert_allclose(np.asarray(full1), np.asarray(xy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xo1), np.asarray(xy), atol=1e-6)
