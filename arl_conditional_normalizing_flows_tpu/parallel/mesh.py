"""Device mesh + sharding helpers.

The reference has NO parallelism of any kind (single process, single device,
bare ``model.fit`` — conv_cINN.py:617-636; SURVEY.md §2.3).  The TPU-native
scaling story is data parallelism over a pod slice: one mesh axis ``data``,
batches sharded over it, parameters replicated.  Under ``jit`` XLA inserts the
gradient/metric ``psum`` collectives automatically from the sharding
annotations; they ride ICI within a host group and DCN across hosts.

Multi-host entry points (``jax.distributed.initialize``,
``make_array_from_process_local_data``) are wrapped here so drivers stay
single-host/multi-host agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_2d_mesh(data: int, model: int, devices: Optional[Sequence] = None) -> Mesh:
    """A (data, model) mesh for optional channel-sharded couplings."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh's data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data", spec=None):
    """Place a host-local batch onto the mesh, sharded on axis 0 (or per
    ``spec``, e.g. ``P(None, "data")`` for the (inner, batch, ...) stacks fed
    to scanned steps).

    Single-process: ``jax.device_put`` with a NamedSharding.  Multi-process:
    each host passes its local shard and we assemble the global array
    (jax.make_array_from_process_local_data).
    """
    if spec is not None:
        sharding = NamedSharding(mesh, spec)
    else:
        sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def _fsdp_rule(mesh: Mesh, x, axis_name: str) -> NamedSharding:
    """Shard one array along its LARGEST dim divisible by the axis size;
    scalars and indivisible shapes replicate."""
    n = mesh.shape[axis_name]
    if not hasattr(x, "shape") or x.ndim == 0 or n == 1:
        return NamedSharding(mesh, P())
    dims = list(x.shape)
    candidates = [d for d in range(len(dims)) if dims[d] % n == 0 and dims[d] >= n]
    if not candidates:
        return NamedSharding(mesh, P())
    d = max(candidates, key=lambda i: dims[i])
    spec = [None] * len(dims)
    spec[d] = axis_name
    return NamedSharding(mesh, P(*spec))


def param_shardings(mesh: Mesh, params, axis_name: str = "model"):
    """FSDP-style parameter sharding over the mesh's ``axis_name`` axis.

    Conv kernels shard their output-channel axis, biases their only axis;
    scalars and indivisible shapes replicate. Under ``jit`` XLA's SPMD
    partitioner inserts the all-gather before each use and the
    reduce-scatter after the gradient, so parameter + optimizer memory
    scales down with the axis while the math is unchanged. Composes with
    the batch-sharded ``data`` axis (2-D mesh from :func:`make_2d_mesh`).

    Returns a pytree of NamedShardings matching ``params``.
    """
    return jax.tree_util.tree_map(lambda x: _fsdp_rule(mesh, x, axis_name), params)


def state_shardings(mesh: Mesh, state, axis_name: str = "model"):
    """Shardings for a full TrainState: params and optimizer moments follow
    :func:`param_shardings` (moments land with their params); step counters
    and other scalars replicate."""
    rule = lambda x: _fsdp_rule(mesh, x, axis_name)
    return state.replace(
        params=jax.tree_util.tree_map(rule, state.params),
        opt_state=jax.tree_util.tree_map(rule, state.opt_state),
        step=NamedSharding(mesh, P()),
    )


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (no-op when already initialized or single host).

    Must run before any other JAX call: ``jax.distributed.initialize``
    refuses to run once the XLA backends exist, and even ``process_count()``
    forces backend init — so the already-initialized check reads the
    distributed global state directly instead of touching the backend.
    """
    if coordinator_address is None:
        return  # single host
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """The half-open row range of the global batch this host should feed."""
    per = global_batch_size // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
