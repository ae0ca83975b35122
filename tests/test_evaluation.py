"""Evaluation stats and plot smoke tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from arl_conditional_normalizing_flows_tpu.evaluation import (
    bits_per_dim,
    latent_normality_stats,
    moment_match_report,
    sr_residual_block_sums,
    y_identity_error,
)


def test_bits_per_dim():
    # uniform over 256 levels: NLL = ln(256) nats/dim -> 8 bits/dim
    assert abs(bits_per_dim(np.log(256.0) * 784, 784) - 8.0) < 1e-9


def test_latent_normality_on_true_gaussian(rng):
    z = rng.normal(size=(20000, 2))
    s = latent_normality_stats(z)
    assert s["mean_abs_mean"] < 0.05
    assert s["mean_abs_std_err"] < 0.05
    assert s["mean_abs_excess_kurtosis"] < 0.2


def test_moment_match_identical_distribution(rng):
    a = rng.normal(size=(5000, 3))
    b = rng.normal(size=(5000, 3))
    r = moment_match_report(a, b)
    assert r["max_mean_diff"] < 5 * r["mc_standard_error"] + 0.05


def test_y_identity_error():
    xy = np.zeros((10, 3))
    xy[:, 2] = 1.5
    r = y_identity_error(xy, 1.5, x_d=2)
    assert r["max_abs"] == 0.0


def test_sr_residual_block_sums_zero_by_construction(rng):
    from arl_conditional_normalizing_flows_tpu.data.images import preprocess_sr

    hires = jnp.asarray(rng.uniform(0, 1, size=(4, 28, 28, 1)).astype(np.float32))
    xy = preprocess_sr(hires, "SR2,1", residual=True)
    x = np.asarray(xy[..., :1])
    r = sr_residual_block_sums(x)
    assert r["max_abs_block_sum"] < 1e-4


def test_plots_smoke(tmp_path, rng):
    from arl_conditional_normalizing_flows_tpu.evaluation import plots

    xy = rng.normal(size=(200, 3)).astype(np.float32)
    plots.plot_toy_joint(xy, tmp_path / "joint.png")
    plots.plot_toy_conditional_grid(
        [rng.normal(size=(50, 2)) for _ in range(3)], [0.0, 1.0, 2.0],
        tmp_path / "grid.png",
    )
    plots.plot_latent(rng.normal(size=(200, 2)), tmp_path / "latent.png")
    plots.plot_loss_curves(
        [{"epoch": i, "loss": 1.0 / (i + 1), "z_loss": 0.5} for i in range(5)],
        tmp_path / "loss.png",
        keys=("loss", "z_loss"),
    )
    plots.plot_image_grid(rng.uniform(size=(6, 8, 8, 1)), tmp_path / "imgs.png")
    plots.plot_sr_comparison(
        rng.uniform(size=(6, 8, 8, 1)),
        rng.uniform(size=(6, 8, 8, 1)),
        rng.uniform(size=(6, 8, 8, 1)),
        tmp_path / "sr.png",
    )
    for f in ["joint.png", "grid.png", "latent.png", "loss.png", "imgs.png", "sr.png"]:
        assert os.path.getsize(tmp_path / f) > 0


def test_conditional_moments_axis_consistency():
    """Moments must agree whichever axis holds the samples (the centering
    previously mis-broadcast for axis != 0)."""
    import numpy as np
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.sample import conditional_moments

    x = jnp.asarray(
        np.random.default_rng(0).normal(2.0, 3.0, size=(5, 4000)).astype(np.float32)
    )
    m0 = conditional_moments(x.T, axis=0)
    m1 = conditional_moments(x, axis=1)
    for k in ("mean", "std", "skew"):
        np.testing.assert_allclose(
            np.asarray(m0[k]), np.asarray(m1[k]), rtol=1e-4, atol=1e-5
        )


def test_new_plot_families_smoke(tmp_path, rng):
    from arl_conditional_normalizing_flows_tpu.evaluation import plots

    n = 120
    y = rng.integers(0, 2, n).astype(np.float32)
    plots.plot_y_identity(
        y, y + rng.normal(0, 1e-3, n), y, y, tmp_path / "yid.png"
    )
    data = np.concatenate([rng.normal(size=(n, 2)), y[:, None]], axis=1)
    plots.plot_forward_backward_grid(
        data, rng.normal(size=(n, 3)), data, tmp_path / "fb.png"
    )
    rows = [
        {"epoch": e, "loss": 1.0 / (e + 1), "z_loss": 1.0, "y_loss": 0.1,
         "detJ_loss": -0.5, "alpha": min(e / 3.0, 1.0)}
        for e in range(8)
    ]
    plots.plot_annealing_history(rows, tmp_path / "ann.png")
    for p in ("yid.png", "fb.png", "ann.png"):
        assert (tmp_path / p).stat().st_size > 0


def test_default_interpolation_conditions_reference_grid():
    """Two standardized classes (labels {0,1}, mean .5, std .5) must give the
    reference's canonical y' grid -2..2 in steps of 0.5 (TOYcINN.py:1115-1126)."""
    from arl_conditional_normalizing_flows_tpu.evaluation import plots

    vals = plots.default_interpolation_conditions([0.0, 1.0], 0.5, 0.5)
    np.testing.assert_allclose(vals, np.arange(-2, 2.01, 0.5), atol=1e-6)
