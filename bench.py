"""Benchmark: batched actor-learner throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

metric = aggregate env-steps/s of the batched actor path (fused XLA actor
program + C++ batched engine). vs_baseline = speedup over the
reference-architecture loop (single env, batch-1 act, per-step host
dispatches — the shape of reference main.py:146-158) measured on the same
hardware in the same process. Learner updates/s is measured too and reported
on stderr.

Env knobs: BENCH_ENVS (default 128), BENCH_ITERS (default 60),
BENCH_GAME (default pong), BENCH_PLATFORM (force e.g. cpu).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import rainbow_tpu  # noqa: E402
from rainbow_tpu import agent as ag  # noqa: E402
from rainbow_tpu.envs.engine import BatchedEnv  # noqa: E402
from rainbow_tpu.ops.preprocess import init_framestack, to_network_input  # noqa: E402
from rainbow_tpu.replay import prioritized as rp  # noqa: E402
from rainbow_tpu.train import actor_step, learner_round  # noqa: E402


def info(msg):
    print(msg, file=sys.stderr, flush=True)


def game_action_space(game):
    return {"pong": 6, "breakout": 4, "space_invaders": 6, "freeway": 3,
            "qbert": 6}[game]


def bench_batched(cfg, game, num_envs, iters, pipeline=False, depth=1):
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from rainbow_tpu.train import (actor_step_packed, pack_resets,
                                    update_step_packed)

    env = BatchedEnv(game, num_envs, seed=1)
    A = env.action_space
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(num_envs, cfg.capacity_per_env, cfg.frame_size)
    stack = init_framestack(num_envs, cfg.history_length,
                            jnp.asarray(env.reset_all()))
    actions = ag.act(agent.params, cfg, A, to_network_input(stack),
                     agent.noise_key)
    acts_np = np.asarray(actions)
    pool = ThreadPoolExecutor(1) if pipeline else None
    queue = deque([actions] * max(depth, 1))

    def serial_iter(stack, rep):
        nonlocal actions, acts_np
        obs, resets, rewards, dones, kinds = env.step(acts_np)
        packed, ridx = pack_resets(resets, kinds)
        actions, stack, rep = actor_step_packed(
            agent.params, agent.noise_key, cfg, A, stack, rep, actions,
            jnp.asarray(obs), jnp.asarray(packed), jnp.asarray(ridx),
            jnp.asarray(rewards), jnp.asarray(dones.astype(bool)),
            jnp.asarray(kinds))
        acts_np = np.asarray(actions)
        return stack, rep

    def pipelined_iter(stack, rep):
        a_exec = queue.popleft()
        a_np = np.asarray(a_exec)
        fut = pool.submit(env.step, a_np)
        a_new = ag.act(agent.params, cfg, A, to_network_input(stack),
                       agent.noise_key)
        a_new.copy_to_host_async()
        queue.append(a_new)
        obs, resets, rewards, dones, kinds = fut.result()
        packed, ridx = pack_resets(resets, kinds)
        stack, rep = update_step_packed(
            cfg, A, stack, rep, a_exec, jnp.asarray(obs),
            jnp.asarray(packed), jnp.asarray(ridx), jnp.asarray(rewards),
            jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))
        return stack, rep

    one_iter = pipelined_iter if pipeline else serial_iter
    for _ in range(3):  # warmup (compile)
        stack, rep = one_iter(stack, rep)
    # Precompile the likely reset-bucket specialisations so a first-seen
    # bucket doesn't pay a full (remote) compile mid-measurement.
    from rainbow_tpu.train import _RESET_BUCKETS
    for b in _RESET_BUCKETS[:4]:  # small buckets cover normal reset rates;
        # each precompiled bucket costs a full program compile
        if 0 < b <= num_envs:
            kinds = np.zeros(num_envs, np.uint8)
            kinds[:max(b // 2, 1)] = 2
            resets = np.zeros((num_envs, 84, 84), np.uint8)
            packed, ridx = pack_resets(resets, kinds)
            fn = update_step_packed if pipeline else None
            if pipeline:
                stack, rep = update_step_packed(
                    cfg, A, stack, rep, jnp.zeros(num_envs, jnp.int32),
                    jnp.zeros((num_envs, 84, 84), jnp.uint8),
                    jnp.asarray(packed), jnp.asarray(ridx),
                    jnp.zeros(num_envs), jnp.zeros(num_envs, bool),
                    jnp.asarray(kinds))
            else:
                actions_, stack, rep = actor_step_packed(
                    agent.params, agent.noise_key, cfg, A, stack, rep,
                    jnp.zeros(num_envs, jnp.int32),
                    jnp.zeros((num_envs, 84, 84), jnp.uint8),
                    jnp.asarray(packed), jnp.asarray(ridx),
                    jnp.zeros(num_envs), jnp.zeros(num_envs, bool),
                    jnp.asarray(kinds))
    jax.block_until_ready(stack)
    t0 = time.perf_counter()
    for _ in range(iters):
        stack, rep = one_iter(stack, rep)
    jax.block_until_ready(stack)
    dt = time.perf_counter() - t0
    env.close()
    if pool:
        pool.shutdown()
    return num_envs * iters / dt, (agent, rep, A)


def bench_single_env_reference_style(cfg, game, steps):
    """The reference's architecture: one env, batch-1 act, device sync every
    step (reference main.py:146-158, agent.py:53-55)."""
    env = BatchedEnv(game, 1, seed=2)
    A = env.action_space
    agent = ag.init_agent(jax.random.key(1), cfg, A)
    rep = rp.init_replay(1, 4096, cfg.frame_size)
    stack = init_framestack(1, cfg.history_length,
                            jnp.asarray(env.reset_all()))
    actions = ag.act(agent.params, cfg, A, to_network_input(stack),
                     agent.noise_key)
    # warmup/compile
    obs, resets, rewards, dones, kinds = env.step(np.asarray(actions))
    actions, stack, rep = actor_step(
        agent.params, agent.noise_key, cfg, A, stack, rep, actions,
        jnp.asarray(obs), jnp.asarray(resets),
        jnp.asarray(rewards), jnp.asarray(dones.astype(bool)),
        jnp.asarray(kinds))
    jax.block_until_ready(actions)
    t0 = time.perf_counter()
    for _ in range(steps):
        acts_np = np.asarray(actions)  # per-step device→host sync
        obs, resets, rewards, dones, kinds = env.step(acts_np)
        actions, stack, rep = actor_step(
            agent.params, agent.noise_key, cfg, A, stack, rep, actions,
            jnp.asarray(obs), jnp.asarray(resets),
            jnp.asarray(rewards), jnp.asarray(dones.astype(bool)),
            jnp.asarray(kinds))
    jax.block_until_ready(actions)
    dt = time.perf_counter() - t0
    env.close()
    return steps / dt


def make_learner_state(cfg, A, num_envs):
    """Fresh agent + replay filled with synthetic transitions."""
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(num_envs, cfg.capacity_per_env, cfg.frame_size)
    append = jax.jit(rp.append, donate_argnums=0)  # eager appends on a
    # multi-GB state would copy every array per op
    rng = np.random.default_rng(0)
    for _ in range(48):
        rep = append(
            rep, jnp.asarray(rng.integers(0, 255, (num_envs, 84, 84),
                                          np.uint8)),
            jnp.zeros(num_envs, jnp.int32), jnp.zeros(num_envs),
            jnp.zeros(num_envs, bool))
    jax.block_until_ready(rep.priorities)
    return agent, rep


def bench_learner(cfg, agent, rep, A, rounds=5, learns_per_round=32):
    key = jax.random.key(5)
    agent, rep, loss = learner_round(agent, rep, cfg, A, learns_per_round,
                                     jnp.float32(0.5), key)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(rounds):
        agent, rep, loss = learner_round(agent, rep, cfg, A,
                                         learns_per_round, jnp.float32(0.5),
                                         jax.random.key(10 + i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return rounds * learns_per_round / dt, float(loss)


def main():
    num_envs = int(os.environ.get("BENCH_ENVS", 128))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    game = os.environ.get("BENCH_GAME", "pong")
    cfg = rainbow_tpu.canonical(
        num_envs=num_envs,
        # canonical 1M total capacity, capped so extreme env counts (the
        # 4096-env stress config) keep the replay within one chip's HBM
        memory_capacity=min(num_envs * 1024, 1_000_000),
        batch_size=32)
    info(f"devices: {jax.devices()}")

    # Learner first, on its own fresh state (a multi-GB actor replay left
    # resident alongside skews the measurement badly).
    if not os.environ.get("BENCH_SKIP_LEARNER"):
        agent, rep = make_learner_state(cfg, game_action_space(game),
                                        num_envs)
        updates_ps, last_loss = bench_learner(cfg, agent, rep,
                                              game_action_space(game))
        info(f"learner: {updates_ps:.1f} updates/s (batch {cfg.batch_size}),"
             f" loss={last_loss:.3f}")
        del agent, rep

    if os.environ.get("BENCH_SKIP_SERIAL"):
        batched_sps = 0.0
    else:
        batched_sps, state = bench_batched(cfg, game, num_envs, iters)
        info(f"batched actor (serial): {batched_sps:.0f} env-steps/s "
             f"@ {num_envs} envs")
        del state  # free the multi-GB replay before the next allocation
    depth = int(os.environ.get("BENCH_DEPTH", 2))
    piped_sps, state = bench_batched(cfg, game, num_envs, iters,
                                     pipeline=True, depth=depth)
    info(f"batched actor (pipelined, depth {depth}): {piped_sps:.0f} "
         f"env-steps/s @ {num_envs} envs")
    batched_sps = max(batched_sps, piped_sps)
    del state

    single_cfg = cfg.replace(num_envs=1)
    single_sps = bench_single_env_reference_style(
        single_cfg, game, max(10, iters // 3))
    info(f"reference-style single env: {single_sps:.1f} env-steps/s")

    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(batched_sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(batched_sps / max(single_sps, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
