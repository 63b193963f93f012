"""pack_resets + packed actor programs must equal the full-resets path."""
import jax
import jax.numpy as jnp
import numpy as np

import rainbow_tpu
from rainbow_tpu import agent as ag
from rainbow_tpu.ops.preprocess import init_framestack
from rainbow_tpu.replay import prioritized as rp
from rainbow_tpu.train import (_RESET_BUCKETS, actor_step, actor_step_packed,
                               pack_resets)


def test_pack_resets_buckets_and_indices():
    rng = np.random.default_rng(0)
    n = 64
    resets = rng.integers(0, 255, (n, 84, 84), np.uint8)
    for n_reset in [0, 1, 7, 8, 9, 40, 64]:
        kinds = np.zeros(n, np.uint8)
        which = rng.choice(n, n_reset, replace=False)
        kinds[which] = rng.integers(1, 3, n_reset)
        packed, idx = pack_resets(resets, kinds)
        assert packed.shape[0] == idx.shape[0]
        assert packed.shape[0] in _RESET_BUCKETS or packed.shape[0] == n
        assert packed.shape[0] >= n_reset
        # valid rows match their source; padding indexes out of range
        valid = idx < n
        assert valid.sum() == n_reset
        np.testing.assert_array_equal(packed[valid], resets[idx[valid]])
        assert np.all(idx[~valid] == n)


def test_packed_actor_step_equals_full():
    cfg = rainbow_tpu.data_efficient(num_envs=16, memory_capacity=16 * 32,
                                     hidden_size=32, multi_step=3)
    A = 4
    rng = np.random.default_rng(1)
    agent = ag.init_agent(jax.random.key(0), cfg, A)

    first = rng.integers(0, 255, (16, 84, 84), np.uint8)

    def fresh():
        return rp.init_replay(16, 32), init_framestack(16, 4,
                                                       jnp.asarray(first))

    obs = rng.integers(0, 255, (16, 84, 84), np.uint8)
    resets = rng.integers(0, 255, (16, 84, 84), np.uint8)
    kinds = np.zeros(16, np.uint8)
    kinds[[2, 5, 11]] = [1, 2, 2]
    resets[kinds == 0] = 0  # full path zero-fills non-reset rows implicitly
    prev = jnp.asarray(rng.integers(0, A, 16))
    rewards = jnp.asarray(rng.normal(size=16).astype(np.float32))
    dones = jnp.asarray(kinds > 0)

    rep1, stack1 = fresh()
    a1, s1, r1 = actor_step(agent.params, agent.noise_key, cfg, A, stack1,
                            rep1, prev, jnp.asarray(obs),
                            jnp.asarray(resets), rewards, dones,
                            jnp.asarray(kinds))
    packed, ridx = pack_resets(resets, kinds)
    rep2, stack2 = fresh()
    a2, s2, r2 = actor_step_packed(agent.params, agent.noise_key, cfg, A,
                                   stack2, rep2, prev, jnp.asarray(obs),
                                   jnp.asarray(packed), jnp.asarray(ridx),
                                   rewards, dones, jnp.asarray(kinds))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    for x, y in zip(jax.tree_util.tree_leaves(r1),
                    jax.tree_util.tree_leaves(r2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
