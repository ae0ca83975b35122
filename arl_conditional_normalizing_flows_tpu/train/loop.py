"""jit/pjit training engine for joint-NLL flow training.

Replaces the reference's Keras ``model.fit`` + custom ``train_step``
(TOYcINN_make_model.py:453-506, conv_cINN_make_model.py:1850-1904) with a
functional, sharding-aware step:

- one jitted ``train_step(state, xy) -> (state, metrics)`` with donated state;
- batch sharded over the mesh's ``data`` axis, params replicated; XLA derives
  the gradient/metric psums from the shardings (no hand-written collectives);
- instance-noise annealing (alpha ramp 0 -> 1 over N epochs, TOYcINN.py:249-287,
  conv_cINN.py:589-628) applied ON DEVICE inside the step, keyed per batch;
- early stopping with best-weight restore, CSV/JSONL history, checkpoint cadence.

The noise pre-training stage (conv_pre_training_cINN_on_noise.py) is the same
engine with a noise data source — see ``noise_batches``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from arl_conditional_normalizing_flows_tpu.ops import noise as noise_ops
from arl_conditional_normalizing_flows_tpu.parallel import mesh as mesh_lib
from arl_conditional_normalizing_flows_tpu.train.metrics import (
    EarlyStopping,
    HistoryLogger,
    MeanMetrics,
)


class TrainState(train_state.TrainState):
    pass


def create_train_state(model, example_xy, learning_rate, seed=0, tx=None):
    """Init params with a dummy forward pass (the reference needs the same
    dummy call before load_weights, conv_cINN.py:572-579) and build Adam.

    When the model's config sets ``ref_compat_shared_init``, the param tree
    is rewritten into the reference's shared-instance init distribution
    (models.init_compat.shared_shape_reinit) — deterministic in ``seed``.
    """
    params = model.init(jax.random.PRNGKey(seed), example_xy)
    if getattr(getattr(model, "cfg", None), "ref_compat_shared_init", False):
        from arl_conditional_normalizing_flows_tpu.models.init_compat import (
            shared_shape_reinit,
        )

        params = shared_shape_reinit(params, seed)
    if tx is None:
        tx = optax.adam(learning_rate)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _make_gather_fn(mesh, state_sharding):
    """FSDP all-gather-at-use: params live sharded in HBM; a replicated
    sharding constraint inside the loss makes XLA gather each weight just
    before its op (and reduce-scatter the update through the output
    sharding). Identity when no FSDP sharding is configured."""
    if mesh is None or state_sharding is None:
        return lambda params: params
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def gather(params):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), params
        )

    return gather


def make_step_fns(
    model,
    mesh=None,
    noise_mode: str = "full",
    x_d: Optional[int] = None,
    state_sharding=None,
):
    """Build jitted (train_step, eval_step).

    Steps take ``(state, xy, key, alpha)``; instance noise
    ``alpha*xy + (1-alpha)*N(0,1)`` is applied inside the step so annealing
    needs no data-pipeline rebuilds (cf. conv_cINN.py:593-628 which re-maps
    the whole tf.data pipeline every annealing epoch).

    Args:
        noise_mode: "full" (conv semantics: noise the whole xy tensor),
            "x_only" (toy semantics, needs ``x_d``), or "none".
        state_sharding: optional TrainState-shaped tree of NamedShardings
            (``parallel.mesh.state_shardings``) for FSDP-style parameter /
            optimizer sharding over a 2-D (data, model) mesh; the batch stays
            sharded on the mesh's "data" axis. Place the state with
            ``jax.device_put(state, state_sharding)`` before the first step.

    NOTE: ``train_step`` DONATES the incoming state's buffers (the standard
    jit-update idiom). After ``state2, _ = train_step(state, ...)`` — or after
    any ``fit(state, ...)`` — the ORIGINAL ``state`` is invalid; always
    continue from the returned state (``FitResult.state``).
    """

    def add_noise(key, xy, alpha):
        if noise_mode == "none":
            return xy
        if noise_mode == "x_only":
            assert x_d is not None, (
                "noise_mode='x_only' requires x_d (the toy variant noises "
                "only the leading x_d dims, TOYcINN_make_datasets.py:1324-1329)"
            )
            return noise_ops.instance_noise_x_only(key, xy, alpha, x_d)
        return noise_ops.instance_noise(key, xy, alpha)

    gather = _make_gather_fn(mesh, state_sharding)

    def loss_fn(params, xy):
        out = model.apply(gather(params), xy, method="log_loss")
        return out["loss"], out

    def _train_step(state, xy, key, alpha):
        xy = add_noise(key, xy, alpha)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, out), grads = grad_fn(state.params, xy)
        state = state.apply_gradients(grads=grads)
        return state, out

    def _eval_step(state, xy):
        _, out = loss_fn(state.params, xy)
        return out

    if mesh is None:
        train_step = jax.jit(_train_step, donate_argnums=(0,))
        eval_step = jax.jit(_eval_step)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        ss = repl if state_sharding is None else state_sharding
        batch = NamedSharding(mesh, P("data"))
        train_step = jax.jit(
            _train_step,
            in_shardings=(ss, batch, repl, repl),
            out_shardings=(ss, repl),
            donate_argnums=(0,),
        )
        eval_step = jax.jit(
            _eval_step, in_shardings=(ss, batch), out_shardings=repl
        )
    return train_step, eval_step


def make_scan_train_step(
    model,
    num_inner: int,
    mesh=None,
    noise_mode: str = "full",
    x_d: Optional[int] = None,
    state_sharding=None,
    unroll: int = 1,
):
    """A multi-step train function: ``num_inner`` optimizer steps fused into
    ONE XLA program via ``lax.scan``.

    Per-step dispatch costs a fixed host->device latency (~4-6 ms through
    this environment's TPU tunnel; microseconds on a local chip but still
    nonzero). Scanning amortizes it to once per ``num_inner`` steps — the
    idiomatic TPU pattern for small models where launch latency, not compute,
    bounds throughput.

    Signature: ``(state, xy_stack, key, alpha) -> (state, mean_metrics)``
    with ``xy_stack`` shaped ``(num_inner, batch, ...)``. Metrics are averaged
    over the inner steps.
    """

    def add_noise(key, xy, alpha):
        if noise_mode == "none":
            return xy
        if noise_mode == "x_only":
            assert x_d is not None, (
                "noise_mode='x_only' requires x_d (the toy variant noises "
                "only the leading x_d dims, TOYcINN_make_datasets.py:1324-1329)"
            )
            return noise_ops.instance_noise_x_only(key, xy, alpha, x_d)
        return noise_ops.instance_noise(key, xy, alpha)

    gather = _make_gather_fn(mesh, state_sharding)

    def loss_fn(params, xy):
        out = model.apply(gather(params), xy, method="log_loss")
        return out["loss"], out

    def _multi_step(state, xy_stack, key, alpha):
        def body(carry, xy):
            state, key = carry
            key, k = jax.random.split(key)
            xy = add_noise(k, xy, alpha)
            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, xy
            )
            state = state.apply_gradients(grads=grads)
            return (state, key), out

        # unroll > 1 gives XLA's scheduler a window across optimizer steps
        # (perf A/B knob; measured results in docs/PERF_NOTES.md)
        (state, _), outs = jax.lax.scan(body, (state, key), xy_stack,
                                        unroll=unroll)
        return state, jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), outs)

    if mesh is None:
        return jax.jit(_multi_step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    ss = repl if state_sharding is None else state_sharding
    batch = NamedSharding(mesh, P(None, "data"))  # (inner, batch, ...)
    return jax.jit(
        _multi_step,
        in_shardings=(ss, batch, repl, repl),
        out_shardings=(ss, repl),
        donate_argnums=(0,),
    )


def epoch_stacks(batches: Iterable, num_inner: int):
    """Group an epoch's batches into (num_inner, B, ...) stacks for
    :func:`make_scan_train_step`.

    Feeding the scanned step with whole stacks amortizes the per-batch
    host->device dispatch (the dominant cost of small-model epochs through a
    remote TPU backend — docs/PERF_NOTES.md). A trailing partial group is
    DROPPED to keep shapes static; with shuffled class-pure batches this
    loses at most ``num_inner - 1`` random batches per epoch.
    """
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == num_inner:
            yield jnp.stack(buf)
            buf = []


def noise_batches(key, num_batches, batch_size, shape, dtype=jnp.float32):
    """Data source for noise pre-training: fresh N(0,1) xy batches every epoch
    (conv_pre_training_cINN_on_noise.py:100-115)."""
    keys = jax.random.split(key, num_batches)
    for k in keys:
        yield noise_ops.renew_noise(k, (batch_size,) + tuple(shape), dtype)


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: HistoryLogger
    completed_epochs: int
    stopped_early: bool


def fit(
    state: TrainState,
    train_step,
    data_epoch_fn: Callable[[jax.Array, int], Iterable],
    *,
    key,
    num_epochs: int,
    eval_step=None,
    val_epoch_fn: Optional[Callable[[jax.Array, int], Iterable]] = None,
    num_annealing_epochs: int = 0,
    patience: Optional[int] = None,
    monitor: str = "loss",
    history: Optional[HistoryLogger] = None,
    mesh=None,
    batch_spec=None,
    initial_epoch: int = 0,
    checkpoint_fn: Optional[Callable[[int, TrainState], None]] = None,
    checkpoint_every: int = 0,
    verbose: bool = True,
) -> FitResult:
    """Run the full training schedule: annealing ramp then clean epochs with
    early stopping (the reference's two-phase driver, TOYcINN.py:249-293,
    conv_cINN.py:589-636).

    ``data_epoch_fn(key, epoch) -> iterable of xy batches`` feeds each epoch;
    annealing epoch i uses alpha = i / num_annealing_epochs, later epochs use
    alpha = 1 (plus whatever permanent noise floor the data source bakes in).

    ``batch_spec`` overrides the default per-batch P("data") placement (e.g.
    P(None, "data") for scanned (inner, batch, ...) stacks). In multi-process
    runs every host must call fit with the same key and a per-host
    ``data_epoch_fn`` slice (``epoch_distributed``); the per-batch noise keys
    and alpha are replicated onto the global mesh explicitly so the jitted
    step sees global arrays on every rank.
    """
    history = history or HistoryLogger()
    multiproc = mesh is not None and jax.process_count() > 1

    def _replicate(x):
        # every host passes the same host-local value; assemble it into a
        # fully-replicated global array (works on any jax version, unlike
        # cross-host device_put)
        from jax.sharding import PartitionSpec as P

        return mesh_lib.shard_batch(x, mesh, spec=P())
    stopper = EarlyStopping(patience) if patience is not None else None
    metrics = MeanMetrics()
    stopped = False
    epoch = initial_epoch
    total = num_annealing_epochs + num_epochs
    # failure detection: the reference has none (SURVEY.md §5) — a NaN loss
    # there just corrupts the rest of the run. Here a non-finite epoch loss
    # stops training and restores the best-seen params when available.
    import math as _math

    def _nan_guard(row, state):
        if _math.isfinite(row["loss"]):
            return state, False
        best = stopper.best_state if stopper is not None else None
        if best is not None:
            state = state.replace(params=best)
        print(
            f"fit: non-finite loss at epoch {epoch} — stopping"
            + (" and restoring best params" if best is not None else ""),
            flush=True,
        )
        return state, True

    completed = initial_epoch
    for epoch in range(initial_epoch, total):
        if epoch < num_annealing_epochs:
            alpha = epoch / float(num_annealing_epochs)
        else:
            alpha = 1.0
        alpha = jnp.float32(alpha)
        if multiproc:
            alpha = _replicate(alpha)
        key, k_epoch = jax.random.split(key)
        metrics.reset()
        t0 = time.time()
        for i, xy in enumerate(data_epoch_fn(k_epoch, epoch)):
            key, k_noise = jax.random.split(key)
            if mesh is not None:
                xy = mesh_lib.shard_batch(xy, mesh, spec=batch_spec)
            if multiproc:
                k_noise = _replicate(k_noise)
            state, out = train_step(state, xy, k_noise, alpha)
            metrics.update(jax.tree_util.tree_map(float, out))
        if metrics.count == 0:
            # an empty epoch would otherwise log loss=0.0 and "converge":
            # typical cause is --scan-steps larger than the batches per epoch
            # (epoch_stacks drops the trailing partial group)
            raise ValueError(
                f"fit: data_epoch_fn yielded no batches at epoch {epoch}; "
                "if using scanned steps, reduce num_inner/--scan-steps below "
                "the number of batches per epoch"
            )
        completed = epoch + 1
        row = metrics.result()
        row["seconds"] = time.time() - t0
        row["alpha"] = float(alpha)

        if eval_step is not None and val_epoch_fn is not None:
            vmetrics = MeanMetrics()
            key, k_val = jax.random.split(key)
            for xy in val_epoch_fn(k_val, epoch):
                if mesh is not None:
                    xy = mesh_lib.shard_batch(xy, mesh)
                vmetrics.update(jax.tree_util.tree_map(float, eval_step(state, xy)))
            row.update({f"val_{k}": v for k, v in vmetrics.result().items()})

        history.log(epoch, row)
        if verbose:
            msg = " ".join(f"{k}={v:.4f}" for k, v in row.items() if k != "epoch")
            print(f"epoch {epoch}: {msg}", flush=True)

        state, failed = _nan_guard(row, state)
        if failed:
            stopped = True
            break

        if checkpoint_fn is not None and checkpoint_every and (
            (epoch + 1) % checkpoint_every == 0
        ):
            checkpoint_fn(epoch, state)

        # early stopping only once annealing is done (the reference's clean
        # fit phase owns the EarlyStopping callback, TOYcINN.py:289-293)
        if stopper is not None and epoch >= num_annealing_epochs:
            if stopper.update(row.get(monitor, row["loss"]), state.params):
                if stopper.best_state is not None:
                    state = state.replace(params=stopper.best_state)
                stopped = True
                break

    return FitResult(
        state=state, history=history, completed_epochs=completed, stopped_early=stopped
    )
