"""Worker for the real 2-process multi-host test (see test_multihost.py).

Each process: own replay shard (synthetic transitions), replicated agent,
global mesh over both processes' CPU devices, then two distributed learner
rounds with cross-process pmean/pmax collectives. Prints MULTIHOST-OK on
success; the parent pytest asserts both workers printed it.
"""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num_procs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import rainbow_tpu  # noqa: E402
from rainbow_tpu import agent as ag  # noqa: E402
from rainbow_tpu.parallel.learner import make_distributed_learn  # noqa: E402
from rainbow_tpu.parallel.multihost import (globalize_agent,  # noqa: E402
                                            globalize_replay,
                                            make_global_mesh)
from rainbow_tpu.replay import prioritized as rp  # noqa: E402

E_LOCAL, CAP = 4, 64
A = 4
cfg = rainbow_tpu.data_efficient(
    num_envs=E_LOCAL * num_procs, memory_capacity=E_LOCAL * num_procs * CAP,
    batch_size=8, hidden_size=32, multi_step=3)

# Identical seed everywhere -> identical replicated agent.
agent = ag.init_agent(jax.random.key(0), cfg, A)

# Process-local replay shard with process-distinct synthetic data.
rep = rp.init_replay(E_LOCAL, CAP)
rng = np.random.default_rng(100 + proc_id)
for _ in range(40):
    rep = rp.append(rep,
                    jnp.asarray(rng.integers(0, 255, (E_LOCAL, 84, 84),
                                             np.uint8)),
                    jnp.zeros(E_LOCAL, jnp.int32),
                    jnp.asarray(rng.normal(size=E_LOCAL).astype(np.float32)),
                    jnp.asarray(rng.random(E_LOCAL) < 0.05))

mesh = make_global_mesh()
assert mesh.devices.size == 2 * num_procs, mesh.devices
agent_g = globalize_agent(mesh, agent)
rep_g = globalize_replay(mesh, rep)

learn = make_distributed_learn(mesh, cfg, A, num_learns=2)
agent_g, rep_g, loss = learn(agent_g, rep_g, jnp.float32(0.5),
                             jax.random.key(7))
loss = float(loss)
assert np.isfinite(loss), loss

# Replicated params must be identical across this process's local shards.
leaf = jax.tree_util.tree_leaves(agent_g.params)[0]
local = [np.asarray(s.data) for s in leaf.addressable_shards]
for s in local[1:]:
    np.testing.assert_array_equal(local[0], s)
# And identical across processes: psum of the first element must equal
# num_devices * value.
probe = jnp.asarray(float(local[0].ravel()[0]))
import functools  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402
total = jax.jit(jax.shard_map(
    lambda x: jax.lax.psum(x, "data"), mesh=mesh,
    in_specs=P(), out_specs=P()))(
        jnp.broadcast_to(probe, (mesh.devices.size,)))
np.testing.assert_allclose(float(np.asarray(total.addressable_data(0))[0]),
                           float(probe) * mesh.devices.size, rtol=1e-6)

print(f"MULTIHOST-OK proc={proc_id} loss={loss:.4f} "
      f"param0={float(probe):.6f}", flush=True)
