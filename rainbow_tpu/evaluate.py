"""Evaluation protocol — the reference's test() (reference test.py:13-58),
re-architected batched.

The reference rolls 10 episodes *sequentially* on one env (test.py:21-34) and
probes 500 validation states one-by-one (test.py:38-39). Here the episodes
run as `evaluation_episodes` parallel eval-mode envs (one episode each,
ε=0.001-greedy, true game-over terminals only) and the validation-Q probe is
a few batched forwards. Metric semantics are identical.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rainbow_tpu import agent as ag
from rainbow_tpu.config import RainbowConfig
from rainbow_tpu.ops.preprocess import (init_framestack, to_network_input,
                                        update_framestack)


def build_validation_states(cfg: RainbowConfig, make_env) -> jax.Array:
    """Random-policy validation states for the held-out Q probe
    (reference main.py:126-136): a small replay filled with uniform-random
    actions, returned as an (evaluation_size, 84, 84, H) batch."""
    from rainbow_tpu.replay import prioritized as rp

    n_envs = min(10, cfg.evaluation_size)
    steps = -(-cfg.evaluation_size // n_envs)  # ceil
    env = make_env(num_envs=n_envs, training=True)
    rng = np.random.default_rng(cfg.seed + 977)
    rep = rp.init_replay(n_envs, steps, cfg.frame_size)
    stack = init_framestack(n_envs, cfg.history_length,
                            jnp.asarray(env.reset_all()))

    @jax.jit
    def fill_step(rep, stack, actions, obs, resets, dones, kinds):
        rep = rp.append(rep, stack[..., -1], actions,
                        jnp.zeros(actions.shape[0]), dones)
        return rep, update_framestack(stack, obs, resets, kinds)

    for _ in range(steps):
        actions = rng.integers(0, env.action_space, n_envs)
        obs, resets, _, dones, kinds = env.step(actions)
        rep, stack = fill_step(rep, stack, jnp.asarray(actions),
                               jnp.asarray(obs), jnp.asarray(resets),
                               jnp.asarray(dones.astype(bool)),
                               jnp.asarray(kinds))
    env.close()
    states = rp.all_states(rep, cfg.history_length)
    return states[:cfg.evaluation_size]


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"))
def _eval_act(params, cfg: RainbowConfig, action_space: int, stack,
              key: jax.Array):
    """One fused dispatch per eval step: key advance + ε-greedy act.
    Keeps the eval loop free of eager per-primitive dispatches (each costs
    ~tunnel-RTT on remote backends — see agent.py key-helper note)."""
    key, k = jax.random.split(key)
    actions = ag.act_e_greedy(params, cfg, action_space,
                              to_network_input(stack), k, cfg.eval_epsilon)
    return actions, key


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack",))
def _eval_step(params, cfg: RainbowConfig, action_space: int, stack,
               key: jax.Array, obs, resets, kinds):
    """Fused per-step eval program: frame-stack advance for the step that
    just ran + next-action selection — ONE dispatch per eval step instead of
    two (each dispatch costs ~tunnel-RTT on remote backends)."""
    stack = update_framestack(stack, obs, resets, kinds)
    key, k = jax.random.split(key)
    actions = ag.act_e_greedy(params, cfg, action_space,
                              to_network_input(stack), k, cfg.eval_epsilon)
    return actions, stack, key


_eval_update = jax.jit(update_framestack)


def run_episodes(cfg: RainbowConfig, params, action_space: int, make_env,
                 key: jax.Array, num_episodes: int,
                 render_dir: str = "") -> List[float]:
    """One episode per parallel eval env; returns per-episode total rewards
    (unclipped, reference test.py:21-34). Eval mode: life losses do not
    terminate (reference env.py:70 gate off). render_dir: if set, saves env
    0's frames as PNGs there (headless analogue of reference env.py:90-92)."""
    env = make_env(num_envs=num_episodes, training=False)
    stack = init_framestack(num_episodes, cfg.history_length,
                            jnp.asarray(env.reset_all()))
    totals = np.zeros(num_episodes)
    finished = np.zeros(num_episodes, bool)
    # Safety cap: max_episode_length raw frames / 4 per agent step, plus slack.
    max_iters = (cfg.max_episode_length or 10 ** 9) // 4 + 100
    it = 0
    actions, key = _eval_act(params, cfg, action_space, stack, key)
    can_deactivate = hasattr(env, "set_active")
    while not finished.all() and it < max_iters:
        obs, resets, rewards, dones, kinds = env.step(np.asarray(actions))
        totals += np.where(finished, 0.0, rewards)
        newly_done = dones.astype(bool) & ~finished
        finished |= dones.astype(bool)
        if can_deactivate and newly_done.any() and not finished.all():
            # Stop simulating finished episodes: the slowest episode should
            # not keep N-1 dead envs burning engine CPU (their rewards are
            # masked above anyway; frames freeze, which the net never sees
            # scored). Matters most at reference eval budgets (108k-frame
            # episodes, reference main.py:27) and on CPU hosts where engine
            # threads compete with XLA.
            env.set_active(~finished)
        actions, stack, key = _eval_step(
            params, cfg, action_space, stack, key, jnp.asarray(obs),
            jnp.asarray(resets), jnp.asarray(kinds))
        if render_dir and not finished[0]:
            _save_frame(render_dir, it, obs[0])
        it += 1
    env.close()
    return totals.tolist()


def _save_frame(render_dir: str, step: int, frame) -> None:
    import os
    os.makedirs(render_dir, exist_ok=True)
    path = f"{render_dir}/frame_{step:06d}"
    try:
        import cv2
        cv2.imwrite(path + ".png", np.asarray(frame))
    except ImportError:  # binary PGM needs no image library
        with open(path + ".pgm", "wb") as f:
            f.write(b"P5\n84 84\n255\n" + np.asarray(frame).tobytes())


def validation_q(cfg: RainbowConfig, params, action_space: int,
                 val_states: jax.Array, chunk: int = 250) -> List[float]:
    """Avg max-Q over the held-out states (reference test.py:38-39), in
    batched chunks instead of 500 batch-1 forwards."""
    qs: List[float] = []
    for i in range(0, val_states.shape[0], chunk):
        q = ag.evaluate_q(params, cfg, action_space, val_states[i:i + chunk])
        qs.extend(np.asarray(q).tolist())
    return qs


def evaluate(cfg: RainbowConfig, params, action_space: int, make_env,
             val_states: jax.Array, key: jax.Array
             ) -> Tuple[float, float, List[float], List[float]]:
    render_dir = ""
    if cfg.render:
        import os
        render_dir = os.path.join(cfg.results_dir, cfg.run_id, "render")
    rewards = run_episodes(cfg, params, action_space, make_env, key,
                           cfg.evaluation_episodes, render_dir=render_dir)
    qs = validation_q(cfg, params, action_space, val_states)
    return (float(np.mean(rewards)), float(np.mean(qs)), rewards, qs)
