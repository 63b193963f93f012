"""Multi-host (multi-process) assembly of the distributed actor-learner.

The reference is strictly single-process (SURVEY.md §2). Here each host
process owns its env-engine slice and replay shard (host-local data paths —
SURVEY.md §5 'Distributed communication backend'); this module turns those
process-local arrays into global jax Arrays over a mesh that spans all
processes, so the shard_map learner of parallel/learner.py runs unchanged —
its pmean/pmax collectives ride ICI within a host's devices and DCN (here:
Gloo/TCP in CPU tests) across hosts.

Bring-up:  jax.distributed.initialize (mesh.init_distributed) →
make_global_mesh() → globalize agent/replay/stack → make_distributed_learn.
Verified end-to-end by tests/test_multihost.py, which runs a real 2-process
learner round over TCP loopback.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def globalize(mesh: Mesh, local, spec: P):
    """Process-local ndarray → global jax.Array with the given partitioning.

    For sharded leaves (P('data')) `local` is this process's shard and the
    global leading dim is local_dim × process_count; for replicated leaves
    (P()) every process passes the same value.
    """
    local = np.asarray(local)
    sharding = NamedSharding(mesh, spec)
    if spec == P():
        global_shape = local.shape
    else:
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local,
                                                  global_shape)


def globalize_replay(mesh: Mesh, rep_local, axis_name: str = "data"):
    """Env-shard every (E_local, ...) replay leaf; replicate scalars."""
    def one(x):
        x = np.asarray(x)
        return globalize(mesh, x, P(axis_name) if x.ndim >= 1 else P())
    return jax.tree.map(one, rep_local)


def local_rows(garr: jax.Array) -> np.ndarray:
    """This process's rows of a leading-axis-sharded global array, as one
    contiguous ndarray (host-side view for the env engine: the actions it
    must execute, ordered by global row index)."""
    shards = {}
    for s in garr.addressable_shards:
        shards.setdefault(s.index[0].start or 0, s)
    return np.concatenate([np.asarray(shards[k].data)
                           for k in sorted(shards)], axis=0)


def local_value(garr):
    """Full value of a REPLICATED global array from this process's copy
    (np.asarray on a non-fully-addressable array would fail)."""
    if not isinstance(garr, jax.Array) or garr.is_fully_addressable:
        return np.asarray(garr)
    if jax.dtypes.issubdtype(garr.dtype, jax.dtypes.prng_key):
        data = local_value(jax.random.key_data(garr))
        return jax.random.wrap_key_data(jax.numpy.asarray(data))
    return np.asarray(garr.addressable_shards[0].data)


def local_params(params):
    """Host-local copy of a replicated params pytree, usable in plain
    single-process jit computations (evaluation, validation-Q)."""
    import jax.numpy as jnp

    def one(x):
        v = local_value(x)
        return v if isinstance(v, jax.Array) else jnp.asarray(v)
    return jax.tree.map(one, params)


def globalize_agent(mesh: Mesh, agent):
    """Replicate the agent state (identical on every process — same seed)."""
    def one(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            # Typed PRNG keys: globalize the raw key data, re-wrap.
            data = globalize(mesh, np.asarray(jax.random.key_data(x)), P())
            return jax.random.wrap_key_data(data)
        return globalize(mesh, x, P())
    return jax.tree.map(one, agent)
