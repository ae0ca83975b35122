"""Roofline bound math (utils/roofline.py): HLO conv parsing, FLOP/byte
accounting, and report structure (VERDICT round-1 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from arl_conditional_normalizing_flows_tpu.utils import (
    device_peaks,
    parse_hlo_convs,
    roofline_report,
)


def _compile(fn, *args):
    return jax.jit(fn).lower(*args).compile()


def test_parse_single_conv_flops_and_bytes():
    # one known conv: (B=2, H=W=8, Cin=4) -> Cout=6, 3x3 SAME
    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    k = jnp.zeros((3, 3, 4, 6), jnp.float32)

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    convs = parse_hlo_convs(_compile(f, x, k).as_text())
    assert len(convs) == 1
    c = convs[0]
    assert c.out_shape == (2, 8, 8, 6)
    # 2 * out_elems * k_spatial * Cin
    assert c.flops == 2 * (2 * 8 * 8 * 6) * 9 * 4
    expected_bytes = (2 * 8 * 8 * 4 + 3 * 3 * 4 * 6 + 2 * 8 * 8 * 6) * 4
    assert c.bytes == expected_bytes


def test_parse_grouped_conv_uses_per_group_channels():
    x = jnp.zeros((2, 8, 8, 8), jnp.float32)
    k = jnp.zeros((3, 3, 2, 8), jnp.float32)  # feature_group_count=4

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    convs = parse_hlo_convs(_compile(f, x, k).as_text())
    assert len(convs) == 1
    # Cin per group = 2, NOT the full 8
    assert convs[0].flops == 2 * (2 * 8 * 8 * 8) * 9 * 2


def test_padded_window_taps_capped_by_lhs_extent():
    # XLA's transposed rewrite of a forward 1x1 conv (seen verbatim in the
    # flagship step's optimized HLO): the rhs "kernel" is the 28x28
    # activation, swept over a 1x1 lhs with pad=27_27 — all taps beyond the
    # lhs extent hit padding. Naive tap counting inflated this op ~780x
    # (1128 GF vs the true 1.44 GF).
    hlo = """
ENTRY %main {
  %p0 = bf16[1,1,112,64]{3,2,1,0} parameter(0)
  %p1 = bf16[128,28,28,112]{3,2,1,0} parameter(1)
  %conv = bf16[128,28,28,64]{3,2,1,0} convolution(%p0, %p1), window={size=28x28 pad=27_27x27_27 rhs_reversal=1x1}, dim_labels=01fb_o01i->f01b
}
"""
    convs = parse_hlo_convs(hlo)
    assert len(convs) == 1
    out_elems = 128 * 28 * 28 * 64
    assert convs[0].flops == 2 * out_elems * 1 * 112  # 1x1 effective window
    # a genuine grad-vs-weight conv (large window over a large lhs) must NOT
    # be capped: 28x28 taps over a 28x28 input are real MACs
    hlo_grad = """
ENTRY %main {
  %a = bf16[128,28,28,112]{3,2,1,0} parameter(0)
  %g = bf16[128,28,28,64]{3,2,1,0} parameter(1)
  %conv = bf16[3,3,112,64]{3,2,1,0} convolution(%a, %g), window={size=28x28 pad=1_1x1_1}, dim_labels=f01b_i01o->01bf
}
"""
    convs = parse_hlo_convs(hlo_grad)
    assert len(convs) == 1
    # lhs f (=batch 128) contracts with rhs i; 28x28 taps over a 28x28 lhs
    assert convs[0].flops == 2 * (3 * 3 * 112 * 64) * (28 * 28) * 128


def test_roofline_report_on_model_step():
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    cfg = ConvFlowConfig(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(8, 8), cardinality=(2, 2), ksize=3,
    )
    model = ConvCFlow(cfg)
    xy = jnp.zeros((4,) + cfg.io_shape, jnp.float32)
    state = create_train_state(model, xy[:1], 3e-4)
    step, _ = make_step_fns(model, noise_mode="none")
    compiled = step.lower(state, xy, jax.random.PRNGKey(0), jnp.float32(1.0)).compile()

    # pretend it ran on a v5e so the peak table engages
    rep = roofline_report(compiled, 1e-3, "TPU v5 lite", batch=4)
    assert rep["conv_ops"] > 10  # fwd + bwd convs of 8 couplings
    assert rep["conv_flops"] > 0 and rep["total_flops"] >= rep["conv_flops"]
    assert 0 < rep["roofline_lower_bound_seconds"] < 1e-3
    assert 0 < rep["fraction_of_roofline"] < 1
    assert 0 < rep["mfu"] < 1
    assert rep["bound_samples_per_sec"] > 4 / 1e-3
    # the bound decomposes into conv + rest
    assert np.isclose(
        rep["roofline_lower_bound_seconds"],
        rep["conv_bound_seconds"] + rep["rest_bound_seconds"],
    )


def test_device_peaks_lookup():
    assert device_peaks("TPU v5 lite") == (197e12, 819e9)
    assert device_peaks("TPU v4") == (275e12, 1228e9)
    assert device_peaks("cpu") is None


def test_peak_table_validation_flag():
    """Only v5e peaks are measurement-validated; other rows must be flagged
    as spec-sheet constants (VERDICT r2 weak #6) rather than silently
    trusted."""
    from arl_conditional_normalizing_flows_tpu.utils.roofline import (
        device_peaks,
        peaks_validated,
    )

    assert peaks_validated("TPU v5 lite")
    assert peaks_validated("TPU v5e")
    for kind in ("TPU v4", "TPU v3", "TPU v2", "TPU v6e", "TPU v5p"):
        assert device_peaks(kind) is not None
        assert not peaks_validated(kind)


def test_statics_from_statics_round_trip_matches_report():
    """The statics/measured split (bench cache resilience, VERDICT r3
    missing #4): statics must JSON-round-trip and recompose into exactly
    the one-shot report."""
    import json

    from arl_conditional_normalizing_flows_tpu.utils import (
        roofline_from_statics,
        roofline_statics,
    )

    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    k = jnp.zeros((3, 3, 4, 6), jnp.float32)

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    compiled = _compile(f, x, k)
    statics = roofline_statics(compiled, "TPU v5 lite")
    cached = json.loads(json.dumps(statics))  # disk round trip
    rep_a = roofline_from_statics(cached, 1e-3, batch=2)
    rep_b = roofline_report(compiled, 1e-3, "TPU v5 lite", batch=2)
    assert rep_a == rep_b
    assert "fraction_of_roofline" in rep_a and "mfu" in rep_a
