"""The complementary-mask pair fusion (models/conv.py ``_couple_pairs``)
skips the combine->compress relayout between consecutive couplings with
complementary masks. It is pure data-movement elision — the math consumed by
every subnet is identical — so fused and unfused passes must agree BITWISE.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
from arl_conditional_normalizing_flows_tpu.models.conv import ConvCFlow as _Cls


def _unfuse(monkeypatch):
    """Disable pair fusion: every coupling goes through the full
    compress -> law -> combine path."""
    monkeypatch.setattr(_Cls, "_couple_pairs", lambda self, plan: list(plan))


CONFIGS = [
    # multi-scale flagship-shaped (squeeze+factor mid-stack)
    dict(io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
         res_blocks=(1, 1), num_kernels=(8, 8), cardinality=(2, 2)),
    # odd channel depth after concat (ceil/floor channel masks)
    dict(io_shape=(4, 4, 3), x_d=2, squeeze_factor_blocks=(0,),
         res_blocks=(1,), num_kernels=(8,), cardinality=(2,),
         dilations=False),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_pair_fusion_is_bitwise_identical(kw, monkeypatch):
    cfg = ConvFlowConfig(**kw)
    model = ConvCFlow(cfg)
    xy = jnp.asarray(
        np.random.default_rng(0).normal(size=(3,) + cfg.io_shape), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), xy)

    zy_f, ld_f = model.apply(params, xy, method="forward")
    x_f = model.apply(params, zy_f, method="inverse")

    _unfuse(monkeypatch)
    zy_u, ld_u = model.apply(params, xy, method="forward")
    x_u = model.apply(params, zy_u, method="inverse")

    np.testing.assert_array_equal(np.asarray(zy_f), np.asarray(zy_u))
    np.testing.assert_array_equal(np.asarray(ld_f), np.asarray(ld_u))
    np.testing.assert_array_equal(np.asarray(x_f), np.asarray(x_u))


def test_pairing_covers_all_couplings():
    """Under the fixed (0,1,2,3) block mask order every coupling lands in a
    pair — half of all inter-coupling relayouts are elided."""
    cfg = ConvFlowConfig(**CONFIGS[0])
    model = ConvCFlow(cfg)
    xy = jnp.zeros((1,) + cfg.io_shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xy)

    def plan_of(m):
        return m._couple_pairs(m.plan)

    bound = model.bind(params)
    ops = plan_of(bound)
    n_pairs = sum(1 for op in ops if op[0] == "pair")
    n_single = sum(1 for op in ops if op[0] == "couple")
    assert n_single == 0
    assert n_pairs == len(bound.couplings) // 2


def test_late_head_cast_noop_in_float32_and_close_in_bf16():
    """late_head_cast must be a numerical NO-OP at compute_dtype float32 and
    stay within bf16 head tolerance at bfloat16 (the law still runs f32 via
    dtype promotion; ops/coupling.py)."""
    base = dict(io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0,),
                res_blocks=(1,), num_kernels=(8,), cardinality=(2,),
                dilations=False, fused_subnet=True)
    xy = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 8, 8, 2)), jnp.float32
    )

    m32 = ConvCFlow(ConvFlowConfig(**base))
    params = m32.init(jax.random.PRNGKey(0), xy)
    m32_late = ConvCFlow(ConvFlowConfig(**base, late_head_cast=True))
    zy_a, ld_a = m32.apply(params, xy, method="forward")
    zy_b, ld_b = m32_late.apply(params, xy, method="forward")
    np.testing.assert_array_equal(np.asarray(zy_a), np.asarray(zy_b))
    np.testing.assert_array_equal(np.asarray(ld_a), np.asarray(ld_b))

    mbf = ConvCFlow(ConvFlowConfig(**base, compute_dtype="bfloat16"))
    mbf_late = ConvCFlow(
        ConvFlowConfig(**base, compute_dtype="bfloat16", late_head_cast=True)
    )
    zy_c, ld_c = mbf.apply(params, xy, method="forward")
    zy_d, ld_d = mbf_late.apply(params, xy, method="forward")
    assert zy_d.dtype == jnp.float32  # flow tensors stay f32
    np.testing.assert_allclose(
        np.asarray(zy_c), np.asarray(zy_d), rtol=2e-2, atol=2e-2
    )
    # and the inverse still round-trips through the promoted law
    back = mbf_late.apply(params, zy_d, method="inverse")
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(xy), rtol=2e-2, atol=2e-2
    )
