"""Distributed actor-learner: per-device env/replay shards + psum gradient
reduction over the mesh (the BASELINE.json scale-out architecture; no
reference equivalent — SURVEY.md §2 'Parallelism').

Design (SURVEY.md §5 'Distributed communication backend'):
  * agent state replicated; env frame stacks and replay arrays sharded on
    their leading env axis over the 'data' mesh axis (XLA keeps the actor
    step fully device-local — computation follows data, no collectives).
  * each device samples `batch_size // n_devices` transitions from its OWN
    replay shard (host-local data path — sampling never crosses the network),
    computes local grads, and the gradient mean rides a psum over ICI.
  * per-device PRNG: keys folded with the device's axis index, so noise and
    sampling streams are distinct but deterministic.
  * priority write-back stays shard-local.

IS weights are renormalised by the GLOBAL combined-batch max (a pmax over
the mesh), exactly matching the reference's single-batch normalisation
(memory.py:153) regardless of shard count.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rainbow_tpu import agent as ag
from rainbow_tpu.config import RainbowConfig
from rainbow_tpu.replay import prioritized as rp


def shard_states(mesh: Mesh, agent_state, rep_state, stack,
                 axis_name: str = "data"):
    """Place agent (replicated) and replay/stack (env-sharded on their
    leading axis; scalar replay leaves replicated) onto the mesh."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    agent_state = jax.device_put(agent_state, repl)
    rep_state = jax.tree.map(
        lambda x: jax.device_put(x, shard if getattr(x, "ndim", 0) >= 1
                                 else repl), rep_state)
    stack = jax.device_put(stack, shard)
    return agent_state, rep_state, stack


def make_distributed_learn(mesh: Mesh, cfg: RainbowConfig, action_space: int,
                           num_learns: int = 1, axis_name: str = "data",
                           jitted: bool = True):
    """Build the jitted multi-device learner round.

    Returns fn(agent, rep, beta, key) -> (agent, rep, mean_loss) with rep
    env-sharded and agent replicated. Inside: shard_map over the mesh axis;
    psum/pmean gradient reduction; an identical Adam update on every device
    keeps the replicated params consistent.

    jitted=False returns the raw shard_map'd callable for embedding inside a
    LARGER jitted program (the fused multi-process train iteration,
    train.train_iter_mp) instead of dispatching it standalone.
    """
    n_dev = mesh.devices.size
    assert cfg.batch_size % n_dev == 0, (
        f"batch_size {cfg.batch_size} must divide over {n_dev} devices")
    local_batch = cfg.batch_size // n_dev

    def local_round_batched(agent: ag.AgentState, rep_shard: rp.ReplayState,
                            beta, key):
        """Batched-PER round under shard_map (cfg.sequential_per=False; see
        train._learner_round_batched_impl for the single-device rationale):
        ONE stratified sample per shard against the round-start snapshot,
        IS weights renormalised by the GLOBAL per-update batch max (pmax),
        one round-wide target forward, scanned updates with pmean'd grads,
        one shard-local priority write-back."""
        import jax.numpy as jnp

        me = jax.lax.axis_index(axis_name)
        # k_noise is derived BEFORE the per-device fold: the online net is
        # replicated, so every device must apply the IDENTICAL per-update
        # noise (one logical net); sampling and target noise stay per-shard.
        k_local, k_noise = jax.random.split(key)
        k_sample, k_target = jax.random.split(jax.random.fold_in(k_local, me))
        big = rp.sample_many(rep_shard, k_sample, beta,
                             num_batches=num_learns, batch_size=local_batch,
                             history=cfg.history_length,
                             n_step=cfg.multi_step, discount=cfg.discount,
                             states_uint8=True)
        wmax = big.pop("weights_max")                      # (NL,)
        gmax = jax.lax.pmax(wmax, axis_name)
        big["weights"] = big["weights"] * (wmax / gmax)[:, None]
        nb, bs = big["next_states"].shape[:2]
        from rainbow_tpu.models.dqn import apply_dqn, draw_noise
        ns_flat = rp.states_to_float(big["next_states"].reshape(
            (nb * bs,) + big["next_states"].shape[2:]))
        pns_target = apply_dqn(agent.target_params, cfg, action_space,
                               ns_flat, k_target, per_sample_noise=True)
        pns_target = pns_target.reshape(nb, bs, action_space, cfg.atoms)
        noise_all = draw_noise(cfg, action_space, k_noise, lead=(num_learns,))

        def body(a, xs):
            batch, pt, eps = xs
            batch = dict(batch,
                         states=rp.states_to_float(batch["states"]),
                         next_states=rp.states_to_float(batch["next_states"]))
            grads, losses, rng = ag.compute_update_pretarget(
                a, cfg, action_space, batch, pt, noise_eps=eps)
            grads = jax.lax.pmean(grads, axis_name)
            a = ag.apply_grads(a, cfg, grads, rng)
            return a, (jax.lax.stop_gradient(losses),
                       jax.lax.pmean(losses.mean(), axis_name))

        agent, (per_sample, mean_losses) = jax.lax.scan(
            body, agent, (big, pns_target, noise_all))
        agent = agent.replace(
            noise_key=jax.random.fold_in(agent.noise_key, 1))
        shard = rp.update_priorities(rep_shard, big["idxs"].reshape(-1),
                                     per_sample.reshape(-1),
                                     cfg.priority_exponent)
        # max_priority is a replicated leaf; shard-local maxima must agree.
        shard = shard.replace(
            max_priority=jax.lax.pmax(shard.max_priority, axis_name))
        return agent, shard, mean_losses.mean()

    def local_round(agent: ag.AgentState, rep_shard: rp.ReplayState,
                    beta, key):
        me = jax.lax.axis_index(axis_name)

        # Carry only the mutated leaves (see train.learner_round) — carrying
        # the frame arrays would materialise a padded replay copy per loop.
        def one_learn(carry, k):
            agent, priorities, max_p = carry
            # Per-update online-noise redraw (reference main.py:150-151).
            # The fold is deterministic and the agent replicated, so every
            # device sees the SAME fresh noise — one logical net, exactly the
            # reference's single-batch semantics over the combined batch.
            agent = ag.reset_noise(agent)
            shard = rep_shard.replace(priorities=priorities,
                                      max_priority=max_p)
            k_local = jax.random.fold_in(k, me)
            batch = rp.sample(shard, k_local, beta,
                              batch_size=local_batch,
                              history=cfg.history_length,
                              n_step=cfg.multi_step,
                              discount=cfg.discount)
            # Renormalise IS weights by the GLOBAL batch max — exact parity
            # with the reference's single-batch normalisation (memory.py:153)
            # across shards.
            global_max = jax.lax.pmax(batch["weights_max"], axis_name)
            batch = dict(batch, weights=batch["weights"]
                         * batch["weights_max"] / global_max)
            grads, losses, rng = ag.compute_update(agent, cfg, action_space,
                                                   batch)
            grads = jax.lax.pmean(grads, axis_name)  # ICI gradient reduction
            agent = ag.apply_grads(agent, cfg, grads, rng)
            shard = rp.update_priorities(shard, batch["idxs"],
                                         losses, cfg.priority_exponent)
            return (agent, shard.priorities, shard.max_priority), \
                jax.lax.pmean(losses.mean(), axis_name)

        (agent, priorities, max_p), losses = jax.lax.scan(
            one_learn, (agent, rep_shard.priorities, rep_shard.max_priority),
            jax.random.split(key, num_learns))
        # max_priority is a replicated leaf; shard-local maxima must agree.
        max_p = jax.lax.pmax(max_p, axis_name)
        return agent, rep_shard.replace(priorities=priorities,
                                        max_priority=max_p), losses.mean()

    # Replay scalar leaves (index/full/max_priority) are replicated; array
    # leaves are env-sharded on their leading axis.
    rep_spec = rp.ReplayState(
        frames=P(axis_name), actions=P(axis_name), rewards=P(axis_name),
        timesteps=P(axis_name), nonterminal=P(axis_name),
        priorities=P(axis_name), index=P(), full=P(), t=P(axis_name),
        max_priority=P())
    mapped = jax.shard_map(
        local_round if cfg.sequential_per else local_round_batched,
        mesh=mesh,
        in_specs=(P(), rep_spec, P(), P()),
        out_specs=(P(), rep_spec, P()),
        check_vma=False)
    return jax.jit(mapped) if jitted else mapped
