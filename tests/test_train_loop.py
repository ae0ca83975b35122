"""Training-loop behaviors: NaN failure guard, annealing schedule, early stop."""

import numpy as np
import jax
import jax.numpy as jnp

from arl_conditional_normalizing_flows_tpu.data import toy_datasets
from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig
from arl_conditional_normalizing_flows_tpu.train import (
    create_train_state,
    fit,
    make_step_fns,
)

CFG = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)


def _fit(lr, num_epochs, patience=None, annealing=0):
    model = ToyCINN(CFG)
    ds = toy_datasets.make_moons_dataset()
    state = create_train_state(model, jnp.zeros((2, 3)), lr)
    step, _ = make_step_fns(model, noise_mode="none")
    return fit(
        state, step, lambda k, e: ds.epoch_iterator(k, 2, 64),
        key=jax.random.PRNGKey(0), num_epochs=num_epochs,
        num_annealing_epochs=annealing, patience=patience, verbose=False,
    )


def test_nan_guard_stops_immediately():
    res = _fit(lr=1e3, num_epochs=20, patience=5)  # absurd lr -> NaN
    assert res.stopped_early
    assert res.completed_epochs <= 2


def test_annealing_alpha_ramp_recorded():
    res = _fit(lr=1e-3, num_epochs=2, annealing=4)
    alphas = [r["alpha"] for r in res.history.rows]
    np.testing.assert_allclose(alphas[:4], [0.0, 0.25, 0.5, 0.75])
    assert all(a == 1.0 for a in alphas[4:])


def test_early_stopping_restores_best():
    res = _fit(lr=1e-3, num_epochs=40, patience=2)
    if res.stopped_early:
        # the restored params give a loss no worse than the best logged + noise
        assert res.completed_epochs < 46


def test_scan_train_step_matches_sequential():
    """num_inner scanned steps == the same steps taken one by one."""
    from arl_conditional_normalizing_flows_tpu.train import make_scan_train_step

    model = ToyCINN(CFG)
    xy = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(5)
    alpha = jnp.float32(1.0)

    state_a = create_train_state(model, xy[0, :1], 1e-3, seed=0)
    step, _ = make_step_fns(model, noise_mode="none")
    outs = []
    for i in range(4):
        state_a, out = step(state_a, xy[i], key, alpha)  # noise off: key unused
        outs.append(float(out["loss"]))

    state_b = create_train_state(model, xy[0, :1], 1e-3, seed=0)
    multi = make_scan_train_step(model, num_inner=4, noise_mode="none")
    state_b, mean_out = multi(state_b, xy, key, alpha)

    np.testing.assert_allclose(float(mean_out["loss"]), np.mean(outs), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_scan_train_step_unroll_equivalent():
    """unroll is a scheduling knob (the bench default is 2): it must not
    change the training math vs the rolled scan."""
    from arl_conditional_normalizing_flows_tpu.train import make_scan_train_step

    model = ToyCINN(CFG)
    xy = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 32, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(5)
    alpha = jnp.float32(0.7)  # noise ON: the key chain must also be identical

    results = []
    for unroll in (1, 2, 4):
        state = create_train_state(model, xy[0, :1], 1e-3, seed=0)
        multi = make_scan_train_step(model, num_inner=4, noise_mode="full",
                                     unroll=unroll)
        state, out = multi(state, xy, key, alpha)
        results.append((float(out["loss"]), state.params))

    for loss, params in results[1:]:
        np.testing.assert_allclose(loss, results[0][0], rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(results[0][1]),
            jax.tree_util.tree_leaves(params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_scan_train_step_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from arl_conditional_normalizing_flows_tpu.parallel import make_mesh
    from arl_conditional_normalizing_flows_tpu.train import make_scan_train_step

    mesh = make_mesh()
    model = ToyCINN(CFG)
    xy = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 3)).astype(np.float32)
    )
    state = create_train_state(model, xy[0, :1], 1e-3)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    multi = make_scan_train_step(model, num_inner=2, mesh=mesh, noise_mode="none")
    xy_s = jax.device_put(xy, NamedSharding(mesh, P(None, "data")))
    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    state, out = multi(state, xy_s, key, jnp.float32(1.0))
    assert np.isfinite(float(out["loss"]))


def test_noise_training_approaches_analytic_entropy():
    """Analytic-NLL check (SURVEY.md §4): trained on standard-normal xy, the
    flow's achievable joint NLL has a CLOSED-FORM optimum — the x-marginal
    cross-entropy z_loss + detJ_loss is bounded below by the N(0, I_2)
    differential entropy log(2*pi*e) ~ 2.838 nats, reached by the identity
    map. A wrong normalization constant, log-det sign, or loss weighting
    breaks this bound or the approach to it."""
    cfg = ToyConfig(num_coupling_layers=12, intermediate_dims=16, num_layers=2)
    model = ToyCINN(cfg)
    state = create_train_state(model, jnp.zeros((2, 3)), 1e-3)
    step, _ = make_step_fns(model, noise_mode="none")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(400):
        xy = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        state, out = step(state, xy, key, jnp.float32(1.0))
    entropy = float(np.log(2 * np.pi * np.e))  # 2.8379
    x_nll = float(out["z_loss"]) + float(out["detJ_loss"])
    # one-sided bound (minus batch-sampling slack) and 10% approach
    assert x_nll > entropy - 0.15, (x_nll, entropy)
    assert x_nll < entropy * 1.10, (x_nll, entropy)
    # the y-identity must also be forming (lambda_y * E|y - y'| falling)
    assert float(out["y_loss"]) < 2.0


def test_conv_noise_training_approaches_analytic_entropy():
    """Conv analogue of the analytic-NLL bound (SURVEY.md §4): on N(0,1) xy
    images the x-marginal cross-entropy z_loss + detJ_loss is bounded below
    by the per-image Gaussian entropy H*W*x_d/2 * log(2*pi*e) (8x8, x_d=1:
    ~90.81 nats) — this pins the conv prior's per-pixel normalization and
    the batch-mean log-det sign. Bound checked on a large held-out batch."""
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )

    cfg = ConvFlowConfig(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(8, 8), cardinality=(2, 2), ksize=3,
    )
    model = ConvCFlow(cfg)
    state = create_train_state(model, jnp.zeros((1,) + cfg.io_shape), 1e-3)
    step, _ = make_step_fns(model, noise_mode="none")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(250):
        xy = jnp.asarray(rng.normal(size=(48,) + cfg.io_shape), jnp.float32)
        state, _ = step(state, xy, key, jnp.float32(1.0))
    heldout = jnp.asarray(rng.normal(size=(2048,) + cfg.io_shape), jnp.float32)
    out = model.apply(state.params, heldout, method="log_loss")
    entropy = 8 * 8 * 1 / 2 * float(np.log(2 * np.pi * np.e))  # 90.81
    x_nll = float(out["z_loss"]) + float(out["detJ_loss"])
    # one-sided bound (minus ~4.5 sigma of 2048-sample MC slack) + approach
    assert x_nll > entropy - 0.6, (x_nll, entropy)
    assert x_nll < entropy * 1.08, (x_nll, entropy)


def test_early_stop_restored_params_survive_donation():
    """The donating train_step deletes the buffers fit hands to EarlyStopping;
    the restored best params must be defensive copies that remain usable
    (saving/eval after any early-stopped run crashed before the fix)."""
    model = ToyCINN(CFG)
    ds = toy_datasets.make_moons_dataset()
    state = create_train_state(model, jnp.zeros((2, 3)), 0.0)  # lr=0: no improvement
    step, eval_step = make_step_fns(model, noise_mode="none")
    res = fit(
        state, step, lambda k, e: ds.epoch_iterator(k, 2, 64),
        key=jax.random.PRNGKey(0), num_epochs=30, patience=1, verbose=False,
    )
    assert res.stopped_early
    # materialize every restored leaf — deleted buffers would raise here
    for leaf in jax.tree_util.tree_leaves(res.state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # and the restored state actually runs
    out = eval_step(res.state, jnp.zeros((4, 3)))
    assert np.isfinite(float(out["loss"]))


def test_empty_epoch_raises():
    """An epoch that yields no batches must fail loudly, not log loss=0.0
    (the --scan-steps > batches-per-epoch pitfall)."""
    import pytest

    model = ToyCINN(CFG)
    state = create_train_state(model, jnp.zeros((2, 3)), 1e-3)
    step, _ = make_step_fns(model, noise_mode="none")
    with pytest.raises(ValueError, match="no batches"):
        fit(
            state, step, lambda k, e: iter(()),
            key=jax.random.PRNGKey(0), num_epochs=2, verbose=False,
        )


def test_resume_past_end_runs_zero_epochs():
    """Resuming a finished run (initial_epoch == total) must not report a
    phantom completed epoch."""
    model = ToyCINN(CFG)
    ds = toy_datasets.make_moons_dataset()
    state = create_train_state(model, jnp.zeros((2, 3)), 1e-3)
    step, _ = make_step_fns(model, noise_mode="none")
    res = fit(
        state, step, lambda k, e: ds.epoch_iterator(k, 1, 32),
        key=jax.random.PRNGKey(0), num_epochs=3, initial_epoch=3, verbose=False,
    )
    assert res.completed_epochs == 3
    assert res.history.rows == []
