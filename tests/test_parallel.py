"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rainbow_tpu
from rainbow_tpu import agent as ag
from rainbow_tpu.ops.preprocess import init_framestack
from rainbow_tpu.parallel.learner import make_distributed_learn, shard_states
from rainbow_tpu.parallel.mesh import make_mesh
from rainbow_tpu.replay import prioritized as rp
from rainbow_tpu.train import actor_step


N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N_DEV
    mesh = make_mesh(jax.devices()[:N_DEV])
    num_envs = 2 * N_DEV
    cfg = rainbow_tpu.data_efficient(
        num_envs=num_envs, memory_capacity=num_envs * 64,
        batch_size=16, hidden_size=32, multi_step=3)
    action_space = 4
    agent = ag.init_agent(jax.random.key(0), cfg, action_space)
    rep = rp.init_replay(num_envs, cfg.capacity_per_env, cfg.frame_size)
    stack = init_framestack(
        num_envs, cfg.history_length,
        jnp.zeros((num_envs, 84, 84), jnp.uint8))
    agent, rep, stack = shard_states(mesh, agent, rep, stack)
    rng = np.random.default_rng(0)
    actions = jnp.zeros((num_envs,), jnp.int32)
    for _ in range(40):
        obs = jnp.asarray(rng.integers(0, 255, (num_envs, 84, 84), np.uint8))
        actions, stack, rep = actor_step(
            agent.params, agent.noise_key, cfg, action_space, stack, rep,
            actions, obs, jnp.zeros_like(obs),
            jnp.asarray(rng.normal(size=num_envs).astype(np.float32)),
            jnp.asarray(rng.random(num_envs) < 0.05),
            jnp.zeros((num_envs,), jnp.uint8))
    return mesh, cfg, action_space, agent, rep, stack


def test_actor_step_stays_sharded(setup):
    mesh, cfg, A, agent, rep, stack = setup
    # frame stacks and replay frames sharded over the env axis
    assert len(stack.addressable_shards) == N_DEV
    assert stack.addressable_shards[0].data.shape[0] == cfg.num_envs // N_DEV
    assert rep.frames.addressable_shards[0].data.shape[0] == \
        cfg.num_envs // N_DEV


def test_distributed_learn_runs_and_stays_replicated(setup):
    mesh, cfg, A, agent, rep, stack = setup
    learn = make_distributed_learn(mesh, cfg, A, num_learns=2)
    agent2, rep2, loss = learn(agent, rep, jnp.float32(0.5), jax.random.key(3))
    assert np.isfinite(float(loss))
    leaf = jax.tree_util.tree_leaves(agent2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == N_DEV
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # priorities were written back on the shards
    assert float(jnp.sum(rep2.priorities != rep.priorities)) > 0


def test_distributed_grads_equal_mean_of_local_grads(setup):
    """SEQUENTIAL mode: the psum-averaged update must equal applying the
    mean of the 8 per-shard gradients computed independently on the host
    (the host re-derivation mirrors the sequential round's key/sampling
    structure exactly)."""
    mesh, cfg, A, agent, rep, stack = setup
    cfg = cfg.replace(sequential_per=True)
    key = jax.random.key(11)
    learn = make_distributed_learn(mesh, cfg, A, num_learns=1)
    agent_dist, _, _ = learn(agent, rep, jnp.float32(0.5), key)

    # Host re-derivation: reproduce each device's local batch and gradient.
    (k_scan,) = jax.random.split(key, 1)
    local_batch = cfg.batch_size // N_DEV
    E_local = cfg.num_envs // N_DEV
    grads_sum = None
    batches = []
    rep_host = jax.tree.map(np.asarray, rep)
    for d in range(N_DEV):
        shard = rp.ReplayState(
            frames=jnp.asarray(rep_host.frames[d * E_local:(d + 1) * E_local]),
            actions=jnp.asarray(rep_host.actions[d * E_local:(d + 1) * E_local]),
            rewards=jnp.asarray(rep_host.rewards[d * E_local:(d + 1) * E_local]),
            timesteps=jnp.asarray(rep_host.timesteps[d * E_local:(d + 1) * E_local]),
            nonterminal=jnp.asarray(rep_host.nonterminal[d * E_local:(d + 1) * E_local]),
            priorities=jnp.asarray(rep_host.priorities[d * E_local:(d + 1) * E_local]),
            index=jnp.asarray(rep_host.index), full=jnp.asarray(rep_host.full),
            t=jnp.asarray(rep_host.t[d * E_local:(d + 1) * E_local]),
            max_priority=jnp.asarray(rep_host.max_priority))
        k_local = jax.random.fold_in(k_scan, d)
        batch = rp.sample(shard, k_local, jnp.float32(0.5),
                          batch_size=local_batch, history=cfg.history_length,
                          n_step=cfg.multi_step, discount=cfg.discount)
        batches.append(batch)
    global_max = max(float(b["weights_max"]) for b in batches)
    # The learner re-draws the online noise before every update
    # (reference main.py:150-151) — mirror that here.
    agent_n = ag.reset_noise(agent)
    for batch in batches:
        batch = dict(batch, weights=batch["weights"]
                     * batch["weights_max"] / global_max)
        g, _, _ = ag.compute_update(agent_n, cfg, A, batch)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads_mean = jax.tree.map(lambda x: x / N_DEV, grads_sum)
    _, rng_expected = (None, jax.random.split(agent_n.rng)[0])
    agent_expected = ag.apply_grads(agent_n, cfg, grads_mean, rng_expected)

    for a, b in zip(jax.tree_util.tree_leaves(agent_dist.params),
                    jax.tree_util.tree_leaves(agent_expected.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_distributed_batched_round_equals_host_rederivation(setup):
    """BATCHED-PER mode (default): the shard_map round must equal the host
    re-derivation — per-shard sample_many against the snapshot, global pmax
    weight renormalisation, round-wide target forward, pmean'd gradients."""
    from rainbow_tpu.models.dqn import apply_dqn

    mesh, cfg, A, agent, rep, stack = setup
    assert not cfg.sequential_per
    key = jax.random.key(17)
    learn = make_distributed_learn(mesh, cfg, A, num_learns=1)
    agent_dist, _, _ = learn(agent, rep, jnp.float32(0.5), key)

    local_batch = cfg.batch_size // N_DEV
    E_local = cfg.num_envs // N_DEV
    rep_host = jax.tree.map(np.asarray, rep)
    shards, bigs = [], []
    for d in range(N_DEV):
        sl = slice(d * E_local, (d + 1) * E_local)
        shard = rp.ReplayState(
            frames=jnp.asarray(rep_host.frames[sl]),
            actions=jnp.asarray(rep_host.actions[sl]),
            rewards=jnp.asarray(rep_host.rewards[sl]),
            timesteps=jnp.asarray(rep_host.timesteps[sl]),
            nonterminal=jnp.asarray(rep_host.nonterminal[sl]),
            priorities=jnp.asarray(rep_host.priorities[sl]),
            index=jnp.asarray(rep_host.index),
            full=jnp.asarray(rep_host.full),
            t=jnp.asarray(rep_host.t[sl]),
            max_priority=jnp.asarray(rep_host.max_priority))
        k_local, k_noise = jax.random.split(key)
        k_sample, k_target = jax.random.split(jax.random.fold_in(k_local, d))
        big = rp.sample_many(shard, k_sample, jnp.float32(0.5),
                             num_batches=1, batch_size=local_batch,
                             history=cfg.history_length,
                             n_step=cfg.multi_step, discount=cfg.discount,
                             states_uint8=True)
        shards.append((shard, k_target))
        bigs.append(big)
    gmax = max(float(b["weights_max"][0]) for b in bigs)
    from rainbow_tpu.models.dqn import draw_noise
    _, k_noise = jax.random.split(key)
    noise_all = draw_noise(cfg, A, k_noise, lead=(1,))
    noise0 = {name: (e_in[0], e_out[0])
              for name, (e_in, e_out) in noise_all.items()}
    grads_sum = None
    for (shard, k_target), big in zip(shards, bigs):
        weights = np.asarray(big["weights"])[0] * \
            float(big["weights_max"][0]) / gmax
        ns = rp.states_to_float(big["next_states"][0])
        pns_t = apply_dqn(agent.target_params, cfg, A, ns, k_target,
                          per_sample_noise=True)
        batch = {
            "states": rp.states_to_float(big["states"][0]),
            "next_states": ns,
            "actions": big["actions"][0],
            "returns": big["returns"][0],
            "nonterminals": big["nonterminals"][0],
            "weights": jnp.asarray(weights),
            "idxs": big["idxs"][0],
        }
        g, _, _ = ag.compute_update_pretarget(agent, cfg, A, batch, pns_t,
                                              noise_eps=noise0)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads_mean = jax.tree.map(lambda x: x / N_DEV, grads_sum)
    rng_expected = jax.random.split(agent.rng)[0]
    agent_expected = ag.apply_grads(agent, cfg, grads_mean, rng_expected)

    for a, b in zip(jax.tree_util.tree_leaves(agent_dist.params),
                    jax.tree_util.tree_leaves(agent_expected.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_data_parallel_trainer(tmp_path):
    """Full training loop with data_parallel=True over the 8-device mesh."""
    from rainbow_tpu.train import Trainer
    cfg = rainbow_tpu.data_efficient(
        num_envs=16, memory_capacity=16 * 256, batch_size=16,
        total_steps=300, learn_start=64, replay_frequency=4,
        target_update=128, evaluation_interval=10 ** 9,
        evaluation_episodes=2, evaluation_size=10,
        architecture="data-efficient", hidden_size=32, multi_step=3,
        env_backend="fake", results_dir=str(tmp_path), run_id="dp",
        max_episode_length=400, data_parallel=True)
    tr = Trainer(cfg)
    # Single-process multi-device DP must take the fused single-dispatch
    # path (train_iter_mp with the embedded shard_map learner round), not a
    # split actor/learner structure (VERDICT r4 item 6): the raw learner is
    # built for embedding and every learning iteration goes through
    # train_iter_mp exactly once.
    assert tr._learn_raw is not None
    import rainbow_tpu.train as train_mod
    calls = {"n": 0}
    real = train_mod.train_iter_mp

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    train_mod.train_iter_mp = counting
    try:
        tr.run()
    finally:
        train_mod.train_iter_mp = real
    assert tr.T >= cfg.total_steps
    iters = tr.T // cfg.num_envs
    assert calls["n"] >= iters  # one fused dispatch per loop iteration
    leaf = jax.tree_util.tree_leaves(tr.agent.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_graft_entry_points():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 6, 51)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-4)
    mod.dryrun_multichip(8)
