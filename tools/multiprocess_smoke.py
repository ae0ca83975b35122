"""Two-process jax.distributed data-parallel training step on CPU.

Validates the TRUE multi-host path (SURVEY.md §2.3): per-process local
batches assembled into a global sharded array
(jax.make_array_from_process_local_data inside parallel.shard_batch), a
replicated-state DP step over the global mesh, and cross-process gradient/
metric reductions (Gloo collectives on CPU; ICI/DCN on TPU pods).

Usage: launched twice (process_id 0 and 1) by tests/test_multiprocess.py,
or by hand:
    python tools/multiprocess_smoke.py 0 &  python tools/multiprocess_smoke.py 1
Both ranks must print the SAME global loss.
"""
import os, sys
proc_id = int(sys.argv[1])
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# bring-up goes through the library helper so this smoke also regression-tests
# it (initialize_distributed must not touch the backend before initializing —
# jax.process_count() here would make jax.distributed.initialize raise)
from arl_conditional_normalizing_flows_tpu.parallel import initialize_distributed
initialize_distributed(coordinator_address=os.environ.get('CNF_COORD', 'localhost:12355'),
                       num_processes=2, process_id=proc_id)
initialize_distributed(coordinator_address='ignored:0')  # idempotent re-call is a no-op
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig
from arl_conditional_normalizing_flows_tpu.parallel import make_mesh, shard_batch
from arl_conditional_normalizing_flows_tpu.train import create_train_state, make_step_fns

print(f'[p{proc_id}] devices: {jax.device_count()} global, {jax.local_device_count()} local', flush=True)
cfg = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
model = ToyCINN(cfg)
mesh = make_mesh()
state = create_train_state(model, jnp.zeros((2,3)), 1e-3)
state = jax.device_put(state, NamedSharding(mesh, P()))
step, _ = make_step_fns(model, mesh=mesh, noise_mode='none')
global_batch = 32
local = np.random.default_rng(proc_id).normal(size=(global_batch // 2, 3)).astype(np.float32)
xy = shard_batch(jnp.asarray(local), mesh)
key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
state, out = step(state, xy, key, jnp.float32(1.0))
print(f'[p{proc_id}] loss: {float(out["loss"]):.4f}', flush=True)
jax.distributed.shutdown()
