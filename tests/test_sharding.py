"""Data-parallel sharding correctness on the 8-device virtual CPU mesh
(SURVEY.md §2.3: the TPU-native scaling story the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arl_conditional_normalizing_flows_tpu.models import (
    ConvCFlow,
    ConvFlowConfig,
    ToyCINN,
    ToyConfig,
)
from arl_conditional_normalizing_flows_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from arl_conditional_normalizing_flows_tpu.train import create_train_state, make_step_fns


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh()


def test_shard_batch_places_on_data_axis(mesh, rng):
    x = rng.normal(size=(16, 3)).astype(np.float32)
    sharded = shard_batch(jnp.asarray(x), mesh)
    assert sharded.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_dp_train_step_matches_single_device(mesh, rng):
    cfg = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
    model = ToyCINN(cfg)
    xy = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    alpha = jnp.float32(1.0)

    state_a = create_train_state(model, xy[:1], 1e-3, seed=0)
    step_single, _ = make_step_fns(model, noise_mode="none")
    state_a, out_a = step_single(state_a, xy, key, alpha)

    state_b = create_train_state(model, xy[:1], 1e-3, seed=0)
    state_b = jax.device_put(state_b, NamedSharding(mesh, P()))
    step_dp, _ = make_step_fns(model, mesh=mesh, noise_mode="none")
    xy_sharded = shard_batch(xy, mesh)
    key_r = jax.device_put(key, NamedSharding(mesh, P()))
    state_b, out_b = step_dp(state_b, xy_sharded, key_r, alpha)

    # loss and updated params agree between 1-device and 8-way DP
    np.testing.assert_allclose(
        float(out_a["loss"]), float(out_b["loss"]), rtol=1e-5
    )
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_eval_step_conv(mesh, rng):
    cfg = ConvFlowConfig(
        io_shape=(4, 4, 2),
        x_d=1,
        squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1),
        num_kernels=(8, 8),
        cardinality=(2, 2),
    )
    model = ConvCFlow(cfg)
    xy = jnp.asarray(rng.normal(size=(16, 4, 4, 2)).astype(np.float32))
    state = create_train_state(model, xy[:1], 3e-4)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    _, eval_dp = make_step_fns(model, mesh=mesh)
    out = eval_dp(state, shard_batch(xy, mesh))
    ref = model.apply(state.params, xy, method="log_loss")
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]), rtol=1e-5)


def test_sharded_sample_fanout(mesh, rng):
    """Conditional-sample fan-out sharded on the samples axis
    (SURVEY.md §5 'conditional-sampling fan-out sharded on a samples axis')."""
    from arl_conditional_normalizing_flows_tpu.sample import sample_conditional

    cfg = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
    model = ToyCINN(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    key = jax.random.PRNGKey(9)
    s_plain = sample_conditional(model, params, key, 0.5, 64, x_d=2)
    s_shard = sample_conditional(model, params, key, 0.5, 64, x_d=2, mesh=mesh)
    assert s_shard.sharding.spec == P("data")
    np.testing.assert_allclose(
        np.asarray(s_plain), np.asarray(s_shard), rtol=1e-5, atol=1e-6
    )


def test_fsdp_2d_mesh_train_step_matches_single_device(rng):
    """FSDP over a (data=2, model=4) mesh: params + Adam moments sharded on
    the model axis, batch on the data axis — one step must produce the same
    loss and updated params as the unsharded step (XLA inserts the
    all-gathers / reduce-scatters; the math is unchanged)."""
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.parallel import (
        make_2d_mesh,
        state_shardings,
    )

    cfg = ConvFlowConfig(
        io_shape=(4, 4, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(8, 8), cardinality=(2, 2), ksize=3,
    )
    model = ConvCFlow(cfg)
    xy = jnp.asarray(rng.normal(size=(16, 4, 4, 2)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    alpha = jnp.float32(1.0)

    state_a = create_train_state(model, xy[:1], 1e-3, seed=0)
    step_single, _ = make_step_fns(model, noise_mode="none")

    mesh2d = make_2d_mesh(2, 4)
    state_b = create_train_state(model, xy[:1], 1e-3, seed=0)
    ss = state_shardings(mesh2d, state_b)
    state_b = jax.device_put(state_b, ss)
    # at least one param leaf must actually be sharded 4-way
    sharded_leaves = [
        p for p, s in zip(
            jax.tree_util.tree_leaves(state_b.params),
            jax.tree_util.tree_leaves(ss.params),
        )
        if s.spec != P()
    ]
    assert sharded_leaves, "no param was sharded on the model axis"
    assert len(sharded_leaves[0].sharding.device_set) == 8  # (2,4) mesh

    step_fsdp, eval_fsdp = make_step_fns(
        model, mesh=mesh2d, noise_mode="none", state_sharding=ss
    )
    xy_sharded = shard_batch(xy, mesh2d)
    losses_a, losses_b = [], []
    for i in range(3):
        k = jax.random.fold_in(key, i)
        state_a, out_a = step_single(state_a, xy, k, alpha)
        state_b, out_b = step_fsdp(state_b, xy_sharded, k, alpha)
        losses_a.append(float(out_a["loss"]))
        losses_b.append(float(out_b["loss"]))
    # identical training trajectory (per-step losses) ...
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4)
    # ... and params equal up to Adam's step-quantized sign sensitivity: a
    # reduction-order flip of a near-zero grad moves an element by ±lr per
    # step, so bound by 2 * steps * lr rather than a float-noise tolerance
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2 * 3 * 1e-3
        )


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
