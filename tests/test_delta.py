"""Sparse frame-delta uploads (engine.step_delta + the delta actor path).

The engine mirrors the device's frame-stack newest slot and ships only the
changed pixels; the device reconstructs obs with one sorted-unique scatter.
Must be lossless — these tests check exact equality against the dense path,
including across life-loss and full resets.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import rainbow_tpu
from rainbow_tpu import agent as ag
from rainbow_tpu.envs.engine import BatchedEnv, FRAME
from rainbow_tpu.ops.preprocess import init_framestack
from rainbow_tpu.replay import prioritized as rp
from rainbow_tpu.train import (actor_step_delta, actor_step_packed,
                               pack_delta, pack_resets)


def apply_delta_np(mirror, counts, pos, val):
    """Numpy re-derivation of the device-side segment-expansion scatter."""
    n = mirror.shape[0]
    offs = np.repeat(np.arange(n, dtype=np.int64) * (FRAME * FRAME),
                     counts.astype(np.int64))
    mirror.reshape(-1)[offs + pos.astype(np.int64)] = val


@pytest.mark.parametrize("game", ["breakout", "qbert"])
def test_step_delta_reconstructs_dense_exactly(game):
    """Twin engines (same seed, same actions): the delta stream applied to a
    host mirror must reproduce the dense obs bit-for-bit through life-loss
    (kind 1) and full resets (kind 2)."""
    n = 8
    dense = BatchedEnv(game, n, seed=7)
    sparse = BatchedEnv(game, n, seed=7)
    f0_dense = dense.reset_all()
    mirror = sparse.reset_all().reshape(n, -1).copy()
    np.testing.assert_array_equal(f0_dense.reshape(n, -1), mirror)

    rng = np.random.default_rng(0)
    kinds_seen = set()
    for _ in range(400):
        acts = rng.integers(0, dense.action_space, n).astype(np.int32)
        obs_d, reset_d, rew_d, done_d, kind_d = (x.copy() for x in
                                                 dense.step(acts))
        counts, pos, val, reset_s, rew_s, done_s, kind_s = \
            sparse.step_delta(acts)
        np.testing.assert_array_equal(rew_d, rew_s)
        np.testing.assert_array_equal(done_d, done_s)
        np.testing.assert_array_equal(kind_d, kind_s)
        if counts is None:  # engine-side near-dense fallback: pos = dense obs
            mirror[:] = pos.reshape(n, -1)
        else:
            assert int(counts.sum()) == pos.shape[0] == val.shape[0]
            # within each env the positions are strictly increasing
            off = 0
            for e in range(n):
                c = int(counts[e])
                if c > 1:
                    assert np.all(np.diff(pos[off:off + c].astype(int)) > 0)
                off += c
            apply_delta_np(mirror, counts, pos, val)
        np.testing.assert_array_equal(obs_d.reshape(n, -1), mirror)
        for e in range(n):
            if kind_s[e] > 0:
                np.testing.assert_array_equal(reset_d[e], reset_s[e])
                mirror[e] = reset_s[e].reshape(-1)
            kinds_seen.add(int(kind_s[e]))
    dense.close()
    sparse.close()
    assert {0, 2} <= kinds_seen  # exercised at least normal steps + resets


def test_mixing_dense_and_delta_steps():
    """The mirror stays valid when dense step() calls are interleaved
    (the Trainer's near-dense fallback path does exactly this)."""
    n = 4
    env = BatchedEnv("pong", n, seed=3)
    twin = BatchedEnv("pong", n, seed=3)
    mirror = env.reset_all().reshape(n, -1).copy()
    twin.reset_all()
    rng = np.random.default_rng(1)
    for i in range(60):
        acts = rng.integers(0, env.action_space, n).astype(np.int32)
        obs_t, reset_t, *_ , kind_t = (x.copy() for x in twin.step(acts))
        if i % 3 == 2:  # dense step on the delta engine: mirror kept by C++
            obs, reset, _, _, kinds = env.step(acts)
            np.testing.assert_array_equal(obs, obs_t)
            mirror = obs.reshape(n, -1).copy()
        else:
            counts, pos, val, reset, _, _, kinds = env.step_delta(acts)
            apply_delta_np(mirror, counts, pos, val)
            np.testing.assert_array_equal(obs_t.reshape(n, -1), mirror)
        for e in range(n):
            if kinds[e] > 0:
                mirror[e] = reset[e].reshape(-1)
    env.close()
    twin.close()


def test_dense_fallback_matches_twin(monkeypatch):
    """When the engine chooses the near-dense fallback (didx=None), dval must
    be the exact dense observations of a twin stepped densely, and
    subsequent delta steps must stay consistent (the C++ mirror is kept
    current either way). Forced by patching the bucket fit."""
    import rainbow_tpu.envs.engine as eng
    n = 2
    env = BatchedEnv("space_invaders", n, seed=5)
    twin = BatchedEnv("space_invaders", n, seed=5)
    mirror = env.reset_all().reshape(n, -1).copy()
    twin.reset_all()
    rng = np.random.default_rng(4)
    real_bucket = eng.delta_bucket
    for i in range(30):
        force_dense = (i % 5 == 2)
        monkeypatch.setattr(eng, "delta_bucket",
                            (lambda k: None) if force_dense else real_bucket)
        acts = rng.integers(0, env.action_space, n).astype(np.int32)
        obs_t, reset_t, *_r, kind_t = (x.copy() for x in twin.step(acts))
        counts, pos, val, reset, _, _, kinds = env.step_delta(acts)
        if counts is None:
            assert force_dense
            mirror[:] = pos.reshape(n, -1)
        else:
            apply_delta_np(mirror, counts, pos, val)
        np.testing.assert_array_equal(obs_t.reshape(n, -1), mirror)
        for e in range(n):
            if kinds[e] > 0:
                mirror[e] = reset[e].reshape(-1)
    env.close()
    twin.close()


def test_delta_bucket_rule():
    """The dense-fallback decision is bucket-based (padded size), not raw
    count: a delta just over a bucket boundary must not upload more than the
    dense frame (ADVICE r1)."""
    from rainbow_tpu.envs.engine import delta_bucket
    assert delta_bucket(0) == 1024
    assert delta_bucket(1024) == 1024
    assert delta_bucket(1025) == 4096
    assert delta_bucket((1 << 22) + 1) is None  # beyond the table -> dense


def test_apply_delta_pad_indices_sorted_unique():
    """The device reconstruction rewrites pad entries (beyond the counts
    sum) to strictly increasing out-of-bounds indices — the scatter asserts
    indices_are_sorted AND unique_indices, so verify against numpy."""
    import jax
    from rainbow_tpu.train import _apply_delta
    n = 3
    stack = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (n, FRAME, FRAME, 4),
                                          np.uint8))
    counts = np.array([2, 0, 1], np.int32)
    pos = np.array([5, 9, 4], np.uint16)
    val = np.array([11, 22, 33], np.uint8)
    ppos, pval = pack_delta(pos, val)
    out = np.asarray(_apply_delta(stack, jnp.asarray(counts),
                                  jnp.asarray(ppos), jnp.asarray(pval)))
    want = np.asarray(stack[..., -1]).copy()
    apply_delta_np(want, counts, pos, val)
    np.testing.assert_array_equal(out, want)


def test_actor_step_delta_equals_dense_actor_step():
    """Given the same logical observations, the delta and dense fused actor
    programs must produce identical actions, frame stacks and replay state."""
    n, h = 4, 4
    cfg = rainbow_tpu.data_efficient(num_envs=n, memory_capacity=n * 32,
                                     hidden_size=32, multi_step=3)
    A = 5
    import jax
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rng = np.random.default_rng(2)
    first = rng.integers(0, 255, (n, FRAME, FRAME), np.uint8)
    stack0 = init_framestack(n, h, jnp.asarray(first))

    prev = np.asarray(stack0[..., -1]).reshape(-1)
    obs = prev.reshape(n, FRAME * FRAME).copy()
    # sparse change: a few pixels per env (env 1 deliberately unchanged —
    # counts may be zero)
    counts = np.zeros(n, np.int32)
    pos_list, val_list = [], []
    for e in range(n):
        k = 0 if e == 1 else 37
        pos = np.sort(rng.choice(FRAME * FRAME, size=k, replace=False))
        vals = rng.integers(0, 255, k).astype(np.uint8)
        obs[e, pos] = vals
        counts[e] = k
        pos_list.append(pos.astype(np.uint16))
        val_list.append(vals)
    dpos = np.concatenate(pos_list)
    dval = np.concatenate(val_list)
    obs = obs.reshape(n, FRAME, FRAME)

    kinds = np.array([0, 0, 1, 2], np.uint8)
    resets = rng.integers(0, 255, (n, FRAME, FRAME), np.uint8)
    resets[kinds == 0] = 0
    packed, ridx = pack_resets(resets, kinds)
    ppos, pval = pack_delta(dpos, dval)
    rewards = jnp.asarray(rng.normal(size=n).astype(np.float32))
    dones = jnp.asarray(kinds > 0)
    a0 = jnp.zeros(n, jnp.int32)

    def fresh():
        return (jnp.array(stack0), rp.init_replay(n, cfg.capacity_per_env,
                                                  cfg.frame_size))

    s1, r1 = fresh()
    act_dense, stack_dense, rep_dense = actor_step_packed(
        agent.params, agent.noise_key, cfg, A, s1, r1, a0, jnp.asarray(obs),
        jnp.asarray(packed), jnp.asarray(ridx), rewards, dones,
        jnp.asarray(kinds))
    s2, r2 = fresh()
    act_delta, stack_delta, rep_delta = actor_step_delta(
        agent.params, agent.noise_key, cfg, A, s2, r2, a0,
        jnp.asarray(counts), jnp.asarray(ppos), jnp.asarray(pval),
        jnp.asarray(packed), jnp.asarray(ridx), rewards,
        dones, jnp.asarray(kinds))

    np.testing.assert_array_equal(np.asarray(act_dense),
                                  np.asarray(act_delta))
    np.testing.assert_array_equal(np.asarray(stack_dense),
                                  np.asarray(stack_delta))
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(rep_dense),
                    jax.tree_util.tree_leaves(rep_delta)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_runs_with_delta_uploads(tmp_path):
    """Short native-engine training run with delta uploads on; completes and
    produces finite metrics."""
    cfg = rainbow_tpu.data_efficient(
        game="pong", num_envs=4, memory_capacity=4 * 256, batch_size=8,
        total_steps=120, learn_start=40, replay_frequency=4,
        target_update=64, evaluation_interval=10 ** 9, evaluation_size=8,
        architecture="data-efficient", hidden_size=32, multi_step=3,
        results_dir=str(tmp_path), run_id="delta", delta_uploads=True,
        max_episode_length=1000)
    from rainbow_tpu.train import Trainer
    tr = Trainer(cfg)
    tr.run()
    assert tr.T >= cfg.total_steps
