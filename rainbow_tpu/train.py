"""Training orchestration — the reference's main-loop capabilities
(reference main.py:104-184) re-architected for a batched actor-learner.

One loop iteration advances all N envs by one agent step (N env-steps), so
per-step device work is exactly two dispatches: one fused actor program
(replay append + frame-stack update + batched greedy act) and, when learning,
one fused learner program that runs the round's `N / replay_frequency` C51
updates as a lax.scan — preserving the reference's replay ratio (one batch-32
update per 4 env-steps, reference main.py:36,163) and its
sample→update→priority-feedback sequencing within the round.

Schedule parity with reference main.py:142-184:
  * noise reset each learn round (main.py:150-151)
  * β annealed linearly to 1 over (T_max − learn_start) (main.py:123,161)
  * learning gated on T ≥ learn_start (main.py:160)
  * target sync every `target_update` env-steps (main.py:177-178)
  * eval every `evaluation_interval` env-steps: episodes + validation-Q,
    best-model save, metrics + plots (main.py:166-174, test.py:42-55)
  * optional periodic full checkpoints (main.py:181-182) — ours are atomic
    and complete (SURVEY.md §5 checkpoint gap).
"""
from __future__ import annotations

import functools
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rainbow_tpu import agent as ag
from rainbow_tpu import checkpoint as ckpt
from rainbow_tpu import evaluate as ev
from rainbow_tpu.config import RainbowConfig
from rainbow_tpu.ops.preprocess import init_framestack, to_network_input, \
    update_framestack
from rainbow_tpu.replay import prioritized as rp
from rainbow_tpu.utils.logging import Timer, log
from rainbow_tpu.utils.plotting import plot_line


def make_env_factory(cfg: RainbowConfig) -> Callable:
    if cfg.env_backend == "fake":
        from rainbow_tpu.envs.fake import FakeAtariEnv

        def factory(num_envs: int, training: bool = True, seed_offset: int = 0):
            return FakeAtariEnv(num_envs, seed=cfg.seed + seed_offset,
                                episode_len=50, life_every=cfg.life_every,
                                training=training)
        return factory

    from rainbow_tpu.envs.engine import BatchedEnv

    def factory(num_envs: int, training: bool = True, seed_offset: int = 0):
        return BatchedEnv(cfg.game, num_envs, cfg.seed + seed_offset,
                          cfg.max_episode_length, training=training)
    return factory


def _update_core(cfg: RainbowConfig, stack, rep: rp.ReplayState,
                 prev_actions, obs, reset_frames, rewards, dones, kinds):
    """Shared trace body: append the just-completed transition (pre-step
    newest frame + action + clipped reward + done, reference main.py:155-157)
    and advance the frame stack."""
    if cfg.reward_clip > 0:
        rewards = jnp.clip(rewards, -cfg.reward_clip, cfg.reward_clip)
    rep = rp.append(rep, stack[..., -1], prev_actions, rewards, dones)
    stack = update_framestack(stack, obs, reset_frames, kinds)
    return stack, rep


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def actor_step(params, noise_key, cfg: RainbowConfig, action_space: int,
               stack, rep: rp.ReplayState, prev_actions, obs, reset_frames,
               rewards, dones, kinds):
    """Fused per-iteration device program: transition append + frame-stack
    advance + next-action selection."""
    stack, rep = _update_core(cfg, stack, rep, prev_actions, obs,
                              reset_frames, rewards, dones, kinds)
    actions = ag.act(params, cfg, action_space, to_network_input(stack),
                     noise_key)
    return actions, stack, rep


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def update_step(cfg: RainbowConfig, action_space: int, stack,
                rep: rp.ReplayState, prev_actions, obs, reset_frames,
                rewards, dones, kinds):
    """Pipelined-mode device program: replay append + frame-stack advance
    WITHOUT action selection (actions were already computed from the
    previous state, overlapping the engine step)."""
    return _update_core(cfg, stack, rep, prev_actions, obs, reset_frames,
                        rewards, dones, kinds)


_RESET_BUCKETS = (0, 8, 32, 128, 512, 2048, 8192)


def pack_resets(resets: np.ndarray, kinds: np.ndarray):
    """Pack the post-reset frames of the envs that actually reset.

    The engine writes a full (N, 84, 84) reset buffer but only rows with
    kind > 0 are meaningful; uploading all N costs as much as the obs upload
    itself. Returns (packed[K, 84, 84], idx[K]) with K the smallest bucket
    ≥ the reset count (bucketing bounds jit specialisations); idx pads with
    N, dropped by the device-side scatter."""
    n = kinds.shape[0]
    idx = np.flatnonzero(kinds)
    k = len(idx)
    for b in _RESET_BUCKETS:
        if b >= k:
            kp = min(b, n)
            break
    else:
        kp = n
    out_idx = np.full((kp,), n, np.int32)
    out_idx[:k] = idx
    packed = np.zeros((kp,) + resets.shape[1:], resets.dtype)
    packed[:k] = resets[idx]
    return packed, out_idx


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def actor_step_packed(params, noise_key, cfg: RainbowConfig,
                      action_space: int, stack, rep: rp.ReplayState,
                      prev_actions, obs, reset_packed, reset_idx, rewards,
                      dones, kinds):
    """actor_step with packed reset frames (see pack_resets)."""
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    return actor_step(params, noise_key, cfg, action_space, stack, rep,
                      prev_actions, obs, reset_frames, rewards, dones, kinds)


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def update_step_packed(cfg: RainbowConfig, action_space: int, stack,
                       rep: rp.ReplayState, prev_actions, obs, reset_packed,
                       reset_idx, rewards, dones, kinds):
    """update_step with packed reset frames (see pack_resets)."""
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    return update_step(cfg, action_space, stack, rep, prev_actions, obs,
                       reset_frames, rewards, dones, kinds)


# Bucket table lives with the engine (envs/engine.py) so step_delta can make
# the dense-fallback decision itself; re-exported here for packers and tests.
from rainbow_tpu.envs.engine import DELTA_BUCKETS as _DELTA_BUCKETS  # noqa: E402
from rainbow_tpu.envs.engine import delta_bucket  # noqa: E402,F401


def pack_delta(dpos: np.ndarray, dval: np.ndarray,
               min_bucket: int = 0):
    """Pad a sparse frame delta (engine.step_delta's uint16 positions +
    uint8 values) to the smallest static bucket so jit specialisations stay
    bounded; pad entries are masked out on device by the counts sum.
    ``min_bucket`` pins a floor (callers that want one stable specialisation
    pass their observed typical size)."""
    k = dpos.shape[0]
    kp = delta_bucket(max(k, min_bucket))
    assert kp is not None, "delta exceeds bucket table; use the dense path"
    out_pos = np.zeros((kp,), np.uint16)
    out_pos[:k] = dpos
    out_val = np.zeros((kp,), np.uint8)
    out_val[:k] = dval
    return out_pos, out_val


def _apply_delta(stack, counts, pos, val):
    """Reconstruct the step observations from the sparse delta against the
    frame stack's newest slot. Global flat indices are rebuilt from the
    per-env counts by a segment expansion (env_id = repeat(arange, counts)),
    then ONE sorted-unique scatter over the flat (N*84*84) uint8 block; pad
    entries (beyond the counts sum) are rewritten to strictly increasing
    out-of-bounds indices, preserving sorted+unique, and dropped."""
    n, f = stack.shape[0], stack.shape[1]
    num_cells = n * f * f
    kp = pos.shape[0]
    env_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                         total_repeat_length=kp)
    idx = env_ids * (f * f) + pos.astype(jnp.int32)
    ar = jnp.arange(kp, dtype=jnp.int32)
    idx = jnp.where(ar < counts.sum(), idx, num_cells + ar)
    prev = stack[..., -1].reshape(-1)
    obs = prev.at[idx].set(val, mode="drop",
                           indices_are_sorted=True,
                           unique_indices=True)
    return obs.reshape(n, f, f)


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def actor_step_delta(params, noise_key, cfg: RainbowConfig,
                     action_space: int, stack, rep: rp.ReplayState,
                     prev_actions, delta_counts, delta_pos, delta_val,
                     reset_packed, reset_idx, rewards, dones, kinds):
    """actor_step with sparse-delta observations (see engine.step_delta) and
    packed reset frames."""
    obs = _apply_delta(stack, delta_counts, delta_pos, delta_val)
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    stack, rep = _update_core(cfg, stack, rep, prev_actions, obs,
                              reset_frames, rewards, dones, kinds)
    actions = ag.act(params, cfg, action_space, to_network_input(stack),
                     noise_key)
    return actions, stack, rep


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("stack", "rep"))
def update_step_delta(cfg: RainbowConfig, action_space: int, stack,
                      rep: rp.ReplayState, prev_actions, delta_counts,
                      delta_pos, delta_val, reset_packed, reset_idx,
                      rewards, dones, kinds):
    """update_step with sparse-delta observations (pipelined mode)."""
    obs = _apply_delta(stack, delta_counts, delta_pos, delta_val)
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    return _update_core(cfg, stack, rep, prev_actions, obs, reset_frames,
                        rewards, dones, kinds)


def _train_iter_core(cfg: RainbowConfig, action_space: int, num_learns: int,
                     agent: ag.AgentState, stack, rep: rp.ReplayState,
                     loop_key, prev_actions, obs, reset_frames, rewards,
                     dones, kinds, beta, sync_target):
    """ONE device program for a full training iteration: transition append +
    frame-stack advance + online-noise redraw + next-action selection +
    ``num_learns`` scanned C51 updates + (masked) hard target sync.

    Why one program: the round-2 profile showed that splitting the iteration
    into separate actor/learner dispatches costs 150-350 ms/iteration on the
    remote-dispatch backend — the learner's donated replay buffers are
    outputs of the still-pending actor program, and resolving that
    cross-program aliasing stalls the dispatch pipeline. Fused, every donated
    input is an output of the PREVIOUS iteration's same program, which
    chains at full device speed (measured 1.6 ms per 64-update round).
    num_learns=0 compiles the warmup specialisation (no learner, no noise
    advance — reference main.py:160 gates all of it on T >= learn_start)."""
    loss = jnp.zeros(())
    if num_learns:
        # Learner round FIRST, against the PRE-append replay snapshot. The
        # rows this iteration appends sit within (history, n_step) of the
        # write head, which the sampling validity mask excludes — the round
        # sees an identical valid set either way (the distribution lags the
        # head by one iteration, the same staleness class as the round-
        # snapshot sampling itself). What the order buys: the 7 GB frames
        # ring then has exactly one use-order — windowed gather, THEN the
        # in-place donated append — so XLA keeps the buffer aliased
        # in-place. Gathering from the just-appended ring (round-4 order)
        # forced a second, layout-converted copy of the whole ring, pushing
        # the program over HBM and triggering compressed-remat spills: the
        # round-5 trace measured ~180 ms/iteration of compress/uncompress
        # traffic at 1024 envs — more than the 256-update round itself.
        agent = ag.reset_noise(agent)  # main.py:150-151 cadence redraw
        loop_key, k = jax.random.split(loop_key)
        rep_ro = rep.replace(priorities=jnp.zeros((0,)),
                             max_priority=jnp.zeros(()))
        impl = _learner_round_impl if cfg.sequential_per \
            else _learner_round_batched_impl
        agent, priorities, max_priority, loss = impl(
            agent, rep_ro, rep.priorities, rep.max_priority, cfg,
            action_space, num_learns, beta, k)
        rep = rep.replace(priorities=priorities, max_priority=max_priority)
        # Hard target sync (reference main.py:177-178) as a masked select so
        # the sync needs no separate dispatch.
        agent = agent.replace(target_params=jax.tree.map(
            lambda p, t: jnp.where(sync_target, p, t),
            agent.params, agent.target_params))
    stack, rep = _update_core(cfg, stack, rep, prev_actions, obs,
                              reset_frames, rewards, dones, kinds)
    actions = ag.act(agent.params, cfg, action_space,
                     to_network_input(stack), agent.noise_key)
    return actions, agent, stack, rep, loop_key, loss


@functools.partial(jax.jit,
                   static_argnames=("cfg", "action_space", "num_learns"),
                   donate_argnames=("agent", "stack", "rep", "loop_key"))
def train_iter_packed(cfg: RainbowConfig, action_space: int, num_learns: int,
                      agent, stack, rep, loop_key, prev_actions, obs,
                      reset_packed, reset_idx, rewards, dones, kinds, beta,
                      sync_target):
    """Fused train iteration, dense observations + packed reset frames."""
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    return _train_iter_core(cfg, action_space, num_learns, agent, stack, rep,
                            loop_key, prev_actions, obs, reset_frames,
                            rewards, dones, kinds, beta, sync_target)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "action_space", "num_learns"),
                   donate_argnames=("agent", "stack", "rep", "loop_key"))
def train_iter_delta(cfg: RainbowConfig, action_space: int, num_learns: int,
                     agent, stack, rep, loop_key, prev_actions, delta_counts,
                     delta_pos, delta_val, reset_packed, reset_idx, rewards,
                     dones, kinds, beta, sync_target):
    """Fused train iteration, sparse-delta observations + packed resets."""
    obs = _apply_delta(stack, delta_counts, delta_pos, delta_val)
    reset_frames = jnp.zeros_like(obs).at[reset_idx].set(
        reset_packed, mode="drop")
    return _train_iter_core(cfg, action_space, num_learns, agent, stack, rep,
                            loop_key, prev_actions, obs, reset_frames,
                            rewards, dones, kinds, beta, sync_target)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "action_space", "num_learns",
                                    "learn_fn"),
                   donate_argnames=("agent", "stack", "rep", "loop_key"))
def train_iter_mp(cfg: RainbowConfig, action_space: int, num_learns: int,
                  learn_fn, agent, stack, rep, loop_key, prev_actions, obs,
                  reset_frames, rewards, dones, kinds, beta, sync_target):
    """Fused MULTI-PROCESS train iteration: ONE SPMD program per step over
    the global mesh — append + frame-stack advance + noise redraw + act +
    the shard_map learner round (``learn_fn``, parallel/learner.py) + masked
    target sync. All inputs are global arrays (env rows sharded over every
    process's devices); append/act are row-local so XLA inserts collectives
    only inside the learner's pmean/pmax.

    Reset frames travel as a dense per-host array (as the non-fused mp path
    already did): the single-process packed form needs a reset-count bucket
    that every process would have to agree on per step, and episode-cap
    resets arrive in bursts that defeat any small static bucket."""
    loss = jnp.zeros(())
    if num_learns:
        # Learner-before-append, as in _train_iter_core: identical valid
        # sample set (head-proximity mask), and the donated frames ring
        # keeps its single in-place use-order.
        agent = ag.reset_noise(agent)
        loop_key, k = jax.random.split(loop_key)
        agent, rep, loss = learn_fn(agent, rep, beta, k)
        agent = agent.replace(target_params=jax.tree.map(
            lambda p, t: jnp.where(sync_target, p, t),
            agent.params, agent.target_params))
    stack, rep = _update_core(cfg, stack, rep, prev_actions, obs,
                              reset_frames, rewards, dones, kinds)
    actions = ag.act(agent.params, cfg, action_space,
                     to_network_input(stack), agent.noise_key)
    return actions, agent, stack, rep, loop_key, loss


@functools.partial(jax.jit, static_argnames=("cfg", "action_space",
                                             "num_learns"),
                   donate_argnames=("agent", "priorities", "max_priority"))
def _learner_round_batched_impl(agent: ag.AgentState, rep: rp.ReplayState,
                                priorities, max_priority, cfg: RainbowConfig,
                                action_space: int, num_learns: int, beta,
                                key):
    """Batched-PER learner round (cfg.sequential_per=False, the default).

    The sequential round (below) re-builds the sum-tree, gathers windows and
    scatters priorities INSIDE every scan step — ~3× the serial kernel chain
    of the net update itself, and measured 2.4 ms/update on the v5e (the
    whole round is latency-bound on small kernels, not flops). Here the
    round's num_learns·batch_size draws happen as ONE stratified pass
    against the round-start priority snapshot (replay/prioritized.py
    sample_many), one windowed gather pre-stages every batch, the scan runs
    only the per-update essentials (noise redraw → double-Q target → grad →
    Adam), and priorities write back once at the end. Double-Q action
    selection and target construction still use each update's CURRENT
    params — only the sampling distribution is round-stale, the standard
    distributed-PER regime (Ape-X); at batched env counts one round IS one
    algorithm iteration. On duplicate sampled indices the write-back order
    is unspecified (the reference would have drawn fresh indices instead;
    both are single-sample priority estimates)."""
    r = rep.replace(priorities=priorities, max_priority=max_priority)
    k_sample, k_target, k_noise = jax.random.split(key, 3)
    big = rp.sample_many(r, k_sample, beta,
                         num_batches=num_learns, batch_size=cfg.batch_size,
                         history=cfg.history_length, n_step=cfg.multi_step,
                         discount=cfg.discount, states_uint8=True)
    big.pop("weights_max")
    # Round-wide target forward: target params are frozen within the round,
    # so ALL batches' target distributions come from one dense forward with
    # per-sample noise (fresher than the reference's per-update redraw,
    # agent.py:74).
    nb, bs = big["next_states"].shape[:2]
    ns_flat = rp.states_to_float(
        big["next_states"].reshape((nb * bs,) + big["next_states"].shape[2:]))
    from rainbow_tpu.models.dqn import apply_dqn, draw_noise
    pns_target = apply_dqn(agent.target_params, cfg, action_space, ns_flat,
                           k_target, per_sample_noise=True)
    pns_target = pns_target.reshape(nb, bs, action_space, cfg.atoms)
    # Per-update online noise for the whole round in ONE batched draw
    # (reference main.py:150-151 redraws per learn; here the redraw is a
    # scan slice instead of 8 in-scan PRNG ops per update).
    noise_all = draw_noise(cfg, action_space, k_noise, lead=(num_learns,))

    def body(a, xs):
        batch, pt, eps = xs
        batch = dict(batch,
                     states=rp.states_to_float(batch["states"]),
                     next_states=rp.states_to_float(batch["next_states"]))
        grads, losses, rng = ag.compute_update_pretarget(a, cfg, action_space,
                                                         batch, pt,
                                                         noise_eps=eps)
        a = ag.apply_grads(a, cfg, grads, rng)
        return a, losses

    agent, losses = jax.lax.scan(body, agent, (big, pns_target, noise_all))
    # Advance the act-noise stream past the round (the scanned per-update
    # redraw no longer touches agent.noise_key).
    agent = agent.replace(noise_key=jax.random.fold_in(agent.noise_key, 1))
    flat_idx = big["idxs"].reshape(-1)
    flat_losses = jax.lax.stop_gradient(losses).reshape(-1)
    r2 = rp.update_priorities(
        rep.replace(priorities=priorities, max_priority=max_priority),
        flat_idx, flat_losses, cfg.priority_exponent)
    return agent, r2.priorities, r2.max_priority, losses.mean()


@functools.partial(jax.jit, static_argnames=("cfg", "action_space",
                                             "num_learns"),
                   donate_argnames=("agent", "priorities", "max_priority"))
def _learner_round_impl(agent: ag.AgentState, rep: rp.ReplayState,
                        priorities, max_priority, cfg: RainbowConfig,
                        action_space: int, num_learns: int, beta, key):
    """`num_learns` sequential C51 updates as one XLA program.

    Only the mutated leaves (agent, priorities, max_priority) are carried,
    donated, and RETURNED. The multi-GB frame/reward/timestep arrays enter as
    read-only inputs and are never outputs — returning them (even unchanged,
    even donated) makes XLA materialise a full copy at the program boundary
    (~20 ms for a 7 GB replay), and carrying them through the scan costs an
    11 GB HLO temp (both observed at 1024 envs × 1M transitions)."""
    def body(carry, k):
        a, p, max_p = carry
        # Re-draw the online-net noise before every update (reference
        # main.py:150-151 + agent.py:49-50 reset noise per learn) — without
        # this, every update in the round shares one frozen noise sample.
        a = ag.reset_noise(a)
        r = rep.replace(priorities=p, max_priority=max_p)
        a, r, loss = ag.learn_step(a, r, cfg, action_space, beta, k)
        return (a, r.priorities, r.max_priority), loss

    (agent, priorities, max_priority), losses = jax.lax.scan(
        body, (agent, priorities, max_priority),
        jax.random.split(key, num_learns))
    return agent, priorities, max_priority, losses.mean()


def learner_round(agent: ag.AgentState, rep: rp.ReplayState,
                  cfg: RainbowConfig, action_space: int, num_learns: int,
                  beta, key):
    """See _learner_round_{batched_,}impl; reassembles the ReplayState."""
    rep_ro = rep.replace(priorities=jnp.zeros((0,)),  # not read by the impl
                         max_priority=jnp.zeros(()))
    impl = _learner_round_impl if cfg.sequential_per \
        else _learner_round_batched_impl
    agent, priorities, max_priority, loss = impl(
        agent, rep_ro, rep.priorities, rep.max_priority, cfg, action_space,
        num_learns, beta, key)
    return agent, rep.replace(priorities=priorities,
                              max_priority=max_priority), loss


class Trainer:
    """Stateful driver around the functional core (host-side scheduling only)."""

    def __init__(self, cfg: RainbowConfig,
                 make_env: Optional[Callable] = None,
                 devices: Optional[list] = None):
        self.cfg = cfg
        self._devices = devices  # explicit device subset for the DP mesh
        # Persistent compilation cache: any entry point (cli, sweep, tests,
        # probes) skips recompiles of previously-seen specialisations —
        # significant where compiles are remote (tens of seconds each).
        # Respect a user-set cache dir (jax config or env var); never
        # override one (ADVICE r2).
        if (jax.config.jax_compilation_cache_dir is None
                and "JAX_COMPILATION_CACHE_DIR" not in os.environ):
            try:
                jax.config.update(
                    "jax_compilation_cache_dir",
                    os.environ.get(
                        "RAINBOW_JAX_CACHE",
                        os.path.expanduser("~/.cache/rainbow_tpu/jax")))
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception as e:
                log(f"compilation cache setup failed: {e!r}")
        self.make_env = make_env or make_env_factory(cfg)
        self.results_dir = os.path.join(cfg.results_dir, cfg.run_id)
        self.proc_id = jax.process_index()
        self.num_procs = jax.process_count()
        self.multi_process = self.num_procs > 1
        self.is_chief = self.proc_id == 0  # file-writing process
        if self.is_chief:
            os.makedirs(self.results_dir, exist_ok=True)
        self.metrics = {"steps": [], "rewards": [], "Qs": [],
                        "best_avg_reward": -float("inf")}
        self.timer = Timer()

        # Per-host env slice: cfg.num_envs is the GLOBAL env count; each
        # process runs its own engine over num_envs/P envs with a
        # process-distinct seed stream (SURVEY.md §5: host-local data paths).
        if self.multi_process:
            assert cfg.num_envs % self.num_procs == 0, (
                f"num_envs {cfg.num_envs} must divide over "
                f"{self.num_procs} processes")
            if cfg.delta_uploads:
                # Sparse deltas need a per-step bucket size every process
                # agrees on; multi-process hosts feed their own devices over
                # local links where the dense upload is not the wall.
                raise ValueError("delta_uploads is a single-process mode")
        self.envs_local = cfg.num_envs // self.num_procs
        # Ring-capacity guard: each env's ring must hold at least one full
        # (-history+1 .. +n) sample window beyond the write-head exclusion
        # zone, or the masked sampler has zero valid mass (the 4096-env
        # regime shrinks capacity_per_env to 244 at the canonical 1M total —
        # ample; this guards pathological num_envs/memory_capacity combos).
        min_cap = 2 * (cfg.history_length + cfg.multi_step) + 2
        if cfg.capacity_per_env < min_cap:
            raise ValueError(
                f"capacity_per_env={cfg.capacity_per_env} "
                f"(memory_capacity {cfg.memory_capacity} / num_envs "
                f"{cfg.num_envs}) is below the minimum {min_cap} for "
                f"history={cfg.history_length}, n={cfg.multi_step}; raise "
                f"memory_capacity or lower num_envs")
        self.env = self.make_env(num_envs=self.envs_local, training=True,
                                 seed_offset=self.proc_id * 7919)
        self.action_space = self.env.action_space
        key = jax.random.key(cfg.seed)  # identical on every process
        k_agent, self.loop_key = jax.random.split(key)
        self.agent = ag.init_agent(k_agent, cfg, self.action_space)
        if cfg.model_path:  # pretrained weights (reference agent.py:26-36)
            params = ckpt.load_params(cfg.model_path)
            self.agent = self.agent.replace(
                params=params, target_params=jax.tree.map(jnp.copy, params))
            log(f"Loaded pretrained model: {cfg.model_path}")
        self.rep = rp.init_replay(self.envs_local, cfg.capacity_per_env,
                                  cfg.frame_size)
        self.T = 0  # env steps taken (reference's T, in agent steps)

        # Learn cadence (see module docstring).
        if cfg.num_envs >= cfg.replay_frequency:
            self.learns_per_iter = cfg.num_envs // cfg.replay_frequency
            self.iters_per_learn = 1
        else:
            self.learns_per_iter = 1
            self.iters_per_learn = cfg.replay_frequency // cfg.num_envs
        self.beta_rate = ((1.0 - cfg.priority_weight)
                          / max(cfg.total_steps - cfg.learn_start, 1))

        # Multi-device data parallelism: replicated agent, env-sharded
        # replay, psum-mean learner (parallel/learner.py). The multi-process
        # path is the same design over a mesh spanning every process's
        # devices (parallel/multihost.py): agent replicated globally, each
        # host's replay rows living on its own devices, pmean/pmax
        # collectives riding ICI within a host and DCN across hosts.
        self._learn_raw = None
        if self.multi_process:
            from rainbow_tpu.parallel.learner import make_distributed_learn
            from rainbow_tpu.parallel.multihost import (globalize_agent,
                                                        globalize_replay,
                                                        make_global_mesh)
            self.mesh = make_global_mesh()
            n_dev = self.mesh.devices.size
            assert cfg.num_envs % n_dev == 0, (
                f"num_envs {cfg.num_envs} must divide over {n_dev} devices")
            # Raw (unjitted) shard_map round: embedded INSIDE the fused
            # per-iteration SPMD program (train_iter_mp) so a multi-process
            # step is one dispatch, like the single-process fast path.
            self._learn_raw = make_distributed_learn(
                self.mesh, cfg, self.action_space, self.learns_per_iter,
                jitted=False)
            self.agent = globalize_agent(self.mesh, self.agent)
            self.rep = globalize_replay(self.mesh, self.rep)
        elif cfg.data_parallel:
            from rainbow_tpu.parallel.learner import (make_distributed_learn,
                                                      shard_states)
            from rainbow_tpu.parallel.mesh import make_mesh
            n_dev = len(self._devices or jax.devices())
            assert cfg.num_envs % n_dev == 0, (
                f"num_envs {cfg.num_envs} must divide over {n_dev} devices")
            self.mesh = make_mesh(self._devices)
            # Raw shard_map round embedded inside the fused per-iteration
            # program (train_iter_mp works unchanged in a single process:
            # same replicated-agent/env-sharded-replay contract, no
            # multihost plumbing) — the local multi-device topology now
            # gets the single-dispatch fast path too (VERDICT r4 item 6;
            # the split actor/learner structure it replaces measured
            # 150-350 ms/iteration of dispatch stalls on remote backends).
            self._learn_raw = make_distributed_learn(
                self.mesh, cfg, self.action_space, self.learns_per_iter,
                jitted=False)
            self.agent, self.rep, _ = shard_states(
                self.mesh, self.agent, self.rep,
                jnp.zeros((cfg.num_envs, 1, 1, 1)))

    def _eval_params(self):
        """Params usable in plain (single-process) jit computations: the
        globally-replicated agent params collapse to this host's copy."""
        if not self.multi_process:
            return self.agent.params
        from rainbow_tpu.parallel.multihost import local_params
        return local_params(self.agent.params)

    # ---- persistence ----------------------------------------------------
    def _full_state(self, include_replay: bool):
        st = {"agent": self.agent, "T": self.T,
              "metrics_json": np.frombuffer(
                  json.dumps(self.metrics).encode(), np.uint8)}
        if include_replay:
            st["replay"] = self.rep
        return st

    def _ckpt_path(self, name: str) -> str:
        """Multi-process runs write one file per host (each host's replay
        rows are only addressable there); single-process keeps plain names."""
        if self.multi_process:
            name += f".proc{self.proc_id}-of-{self.num_procs}"
        return os.path.join(self.results_dir, name)

    def save_checkpoint(self, name="checkpoint.npz", include_replay=None):
        if include_replay is None:
            include_replay = self.cfg.memory_path is not None
        os.makedirs(self.results_dir, exist_ok=True)
        ckpt.save_pytree(self._ckpt_path(name),
                         self._full_state(include_replay),
                         compress=include_replay and self.cfg.compress_memory)

    def restore_checkpoint(self, path: str):
        """Restore a checkpoint. In a multi-process run every process passes
        the BASE path (without the .procK suffix) and loads its own file,
        re-globalizing the agent (replicated) and its replay shard over the
        mesh."""
        if self.multi_process:
            base = path
            if not os.path.exists(base) or self.num_procs > 1:
                suffixed = f"{path}.proc{self.proc_id}-of-{self.num_procs}"
                if os.path.exists(suffixed):
                    base = suffixed
            st = ckpt.load_pytree(base)
            from rainbow_tpu.parallel.multihost import (globalize_agent,
                                                        globalize_replay)
            self.agent = globalize_agent(
                self.mesh, ag.adapt_opt_state(st["agent"], self.cfg))
            if "replay" in st:
                self.rep = globalize_replay(self.mesh, st["replay"])
        else:
            st = ckpt.load_pytree(path)
            self.agent = ag.adapt_opt_state(
                jax.tree.map(jnp.asarray, st["agent"]), self.cfg)
            if "replay" in st:
                self.rep = jax.tree.map(jnp.asarray, st["replay"])
            if self.cfg.data_parallel and not self.multi_process:
                # re-apply the DP shardings
                from rainbow_tpu.parallel.learner import shard_states
                self.agent, self.rep, _ = shard_states(
                    self.mesh, self.agent, self.rep,
                    jnp.zeros((self.cfg.num_envs, 1, 1, 1)))
        self.T = int(st["T"])
        self.metrics = json.loads(bytes(st["metrics_json"]).decode())
        log(f"Restored checkpoint at T={self.T} from {path}")

    # ---- evaluation -----------------------------------------------------
    def _eval_env_factory(self):
        return lambda num_envs, training: self.make_env(
            num_envs=num_envs, training=training, seed_offset=1234)

    def evaluate_now(self, val_states, evaluate_only=False):
        """Evaluate the current policy. Multi-process: only the CHIEF rolls
        the eval episodes + validation-Q (running the same eval on every
        process was correct but wasteful — VERDICT r2); the scalar metrics
        and per-episode/state vectors are broadcast so every process records
        identical metrics (checkpoints stay consistent everywhere)."""
        self.loop_key, k = ag.split2(self.loop_key)
        if self.multi_process:
            # The training loop's key is a replicated GLOBAL array once the
            # fused SPMD program has run; evaluation is process-local jit, so
            # collapse to this host's copy (identical everywhere).
            from jax.experimental import multihost_utils

            from rainbow_tpu.parallel.multihost import local_value
            k = local_value(k)
            n_ep = self.cfg.evaluation_episodes
            n_q = int(val_states.shape[0])
            if self.is_chief:
                avg_r, avg_q, rewards, qs = ev.evaluate(
                    self.cfg, self._eval_params(), self.action_space,
                    self._eval_env_factory(), val_states, k)
                payload = (np.asarray(rewards, np.float32).reshape(n_ep),
                           np.asarray(qs, np.float32).reshape(n_q))
            else:
                payload = (np.zeros(n_ep, np.float32),
                           np.zeros(n_q, np.float32))
            rewards_a, qs_a = multihost_utils.broadcast_one_to_all(payload)
            rewards = np.asarray(rewards_a).tolist()
            qs = np.asarray(qs_a).tolist()
            avg_r = float(np.mean(rewards))
            avg_q = float(np.mean(qs))
        else:
            avg_r, avg_q, rewards, qs = ev.evaluate(
                self.cfg, self._eval_params(), self.action_space,
                self._eval_env_factory(), val_states, k)
        if not evaluate_only:
            self._apply_eval_result(self.T, self._eval_params(), avg_r,
                                    avg_q, rewards, qs)
        return avg_r, avg_q

    def _apply_eval_result(self, T, params, avg_r, avg_q, rewards, qs):
        """Record one evaluation's metrics + artifacts (reference
        test.py:42-55). ``params`` is the snapshot evaluated (== live params
        in the synchronous path)."""
        self.metrics["steps"].append(T)
        self.metrics["rewards"].append(rewards)
        self.metrics["Qs"].append(qs)
        best = avg_r > self.metrics["best_avg_reward"]
        if best:
            self.metrics["best_avg_reward"] = avg_r
        if self.is_chief:
            if best:
                ckpt.save_params(
                    os.path.join(self.results_dir, "model.npz"),
                    params)  # best save, test.py:43-46
            with open(os.path.join(self.results_dir,
                                   "metrics.json"), "w") as f:
                json.dump(self.metrics, f)
            plot_line(self.metrics["steps"], self.metrics["rewards"],
                      "Reward", self.results_dir)
            plot_line(self.metrics["steps"], self.metrics["Qs"], "Q",
                      self.results_dir)

    # Async evaluation (cfg.async_eval): episodes + validation-Q run on a
    # background thread against a COPY of the params (the live params'
    # buffers are donated into the next fused iteration, so the snapshot
    # must own its memory). Device work interleaves on the chip's stream —
    # eval programs are tiny next to a fused train iteration — while the
    # training loop keeps dispatching. Results are drained in T-order on the
    # main thread (single eval worker => FIFO).
    def _eval_async_start(self, val_states, force=False):
        import queue as _queue
        if not hasattr(self, "_eval_pool"):
            # >1 worker overlaps the device→host round trips of CONCURRENT
            # evaluations on RTT-bound links (each eval is a serial chain of
            # per-step dispatches; independent evals pipeline through the
            # link's idle gaps). Results are applied strictly in submission
            # order via the seq machinery below, so metrics['steps'] stays
            # monotone and best-model selection is order-independent.
            self._eval_pool = ThreadPoolExecutor(
                max(int(getattr(self.cfg, "eval_workers", 1)), 1))
            self._eval_results = _queue.Queue()
            self._eval_futs = []
            self._eval_seq_next = 0     # next seq to submit
            self._eval_seq_apply = 0    # next seq to apply
            self._eval_done = {}        # seq -> result tuple (or None)
        # Bounded backlog: an evaluation is RTT-bound (one fused dispatch per
        # episode step), so on high-latency links it can outlast the
        # evaluation interval's worth of training. Round 3 skipped whenever
        # one was in flight, which under-sampled short suite runs (4/10
        # evals recorded — VERDICT r3 weak #4). Now each scheduled eval
        # SNAPSHOTS the params immediately (one on-device copy, so the
        # measurement is of the params at the scheduled T regardless of when
        # the episodes actually run) and queues on the single eval worker;
        # only when cfg.max_pending_evals snapshots are already waiting is
        # the interval skipped (recorded in metrics['skipped_evals'] so
        # curve-density is auditable — a coalesced run is distinguishable
        # from a fast one). The final eval (force=True) always runs.
        self._eval_futs = [f for f in self._eval_futs if not f.done()]
        pending = len(self._eval_futs)
        # WAITING snapshots = in-flight minus those actually running on the
        # worker pool; the bound is on the queue, not on concurrency, so
        # raising eval_workers is never self-defeating. max_pending_evals=0
        # restores "skip whenever all workers are busy".
        waiting = max(0, pending - max(int(self.cfg.eval_workers), 1))
        if not force and pending > 0 and \
                waiting >= max(self.cfg.max_pending_evals, 0):
            self._eval_skipped_since = self.T
            self.metrics.setdefault("skipped_evals", []).append(self.T)
            log(f"T = {self.T} | evaluation skipped ({pending} already "
                f"in flight; interval shorter than eval wall time)")
            return
        self._eval_skipped_since = None
        self.loop_key, k = ag.split2(self.loop_key)
        params = ag._copy_tree(self._eval_params())
        T = self.T

        seq = self._eval_seq_next
        self._eval_seq_next += 1

        def job():
            try:
                avg_r, avg_q, rewards, qs = ev.evaluate(
                    self.cfg, params, self.action_space,
                    self._eval_env_factory(), val_states, k)
                self._eval_results.put(
                    (seq, (T, params, avg_r, avg_q, rewards, qs)))
            except Exception as e:  # surface, don't kill training
                log(f"async eval at T={T} failed: {e!r}")
                self._eval_results.put((seq, None))  # keep apply-order moving

        self._eval_futs.append(self._eval_pool.submit(job))

    def _eval_async_drain(self, wait=False):
        if not hasattr(self, "_eval_pool"):
            return
        if wait:
            for f in self._eval_futs:
                f.result()
            self._eval_futs.clear()
        while not self._eval_results.empty():
            seq, res = self._eval_results.get()
            self._eval_done[seq] = res
        # Apply strictly in submission order (concurrent workers may finish
        # out of order); a failed eval leaves a None placeholder.
        while self._eval_seq_apply in self._eval_done:
            res = self._eval_done.pop(self._eval_seq_apply)
            self._eval_seq_apply += 1
            if res is None:
                continue
            T, params, avg_r, avg_q, rewards, qs = res
            self._apply_eval_result(T, params, avg_r, avg_q, rewards, qs)
            if self.is_chief:
                log(f"T = {T} / {self.cfg.total_steps} | Avg. reward: "
                    f"{avg_r} | Avg. Q: {avg_q:.4f} | "
                    f"{self.timer.summary()}")

    # ---- main loop ------------------------------------------------------
    def run(self):
        cfg = self.cfg
        log("Building validation memory")
        val_states = ev.build_validation_states(
            cfg, lambda num_envs, training: self.make_env(
                num_envs=num_envs, training=training, seed_offset=4321))

        stack = init_framestack(self.envs_local, cfg.history_length,
                                jnp.asarray(self.env.reset_all()))
        if self.multi_process:
            from jax.sharding import PartitionSpec as P
            from rainbow_tpu.parallel.multihost import globalize, local_rows
            stack = globalize(self.mesh, np.asarray(stack), P("data"))
        elif cfg.data_parallel:
            from rainbow_tpu.parallel.mesh import env_sharded
            stack = jax.device_put(stack, env_sharded(self.mesh))
        self.loop_key, k0 = ag.split2(self.loop_key)
        actions = ag.act(self.agent.params, cfg, self.action_space,
                         to_network_input(stack), self.agent.noise_key)
        acts_np = (local_rows(actions) if self.multi_process
                   else np.asarray(actions))
        use_delta = cfg.delta_uploads and hasattr(self.env, "step_delta")
        env_step = self.env.step_delta if use_delta else self.env.step

        def stage_args_mp(a_local_np):
            """Multi-process staging: this host's engine step, then each
            output becomes this host's rows of a global env-sharded array
            (one make_array_from_process_local_data per field — local
            device_puts only, no cross-host traffic). Runs on the worker
            thread in pipelined mode, exactly like stage_args."""
            obs, resets, rewards, dones, kinds = env_step(a_local_np)
            g = lambda x, dt=None: globalize(
                self.mesh, np.ascontiguousarray(x, dt), P("data"))
            return (g(obs), g(resets), g(rewards, np.float32),
                    g(dones.astype(bool)), g(kinds))

        def stage_args_dp(a_np):
            """Single-process data-parallel staging: engine step, then
            device_put each output env-sharded over the local mesh (dense
            reset frames, like the mp path) so the fused program's inputs
            arrive pre-sharded instead of jit inserting reshards."""
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P("data"))
            obs, resets, rewards, dones, kinds = env_step(a_np)
            g = lambda x, dt=None: jax.device_put(
                np.ascontiguousarray(x, dt), shard)
            return (g(obs), g(resets), g(rewards, np.float32),
                    g(dones.astype(bool)), g(kinds))

        def fused_dispatch_mp(tail, a_exec, stack, num_learns, beta,
                              sync_target):
            """ONE SPMD program per multi-process iteration (train_iter_mp):
            append + act + embedded shard_map learner round + masked target
            sync — the single-dispatch structure of the single-process fast
            path, previously forbidden under multi-process (VERDICT r2)."""
            actions, self.agent, stack, self.rep, self.loop_key, loss = \
                train_iter_mp(cfg, self.action_space, num_learns,
                              self._learn_raw, self.agent, stack, self.rep,
                              self.loop_key, a_exec, *tail,
                              np.float32(beta), np.bool_(sync_target))
            if num_learns:
                self._last_loss = loss
            return actions, stack

        # Fused fast paths: the whole iteration (append + noise redraw +
        # act + learner round + target sync) is ONE device program
        # (train_iter_* single-process single-device, train_iter_mp for
        # both multi-process and single-process multi-device DP).
        # Separate actor/learner dispatches stall the dispatch pipeline
        # resolving cross-program donation of the replay buffers (150-350
        # ms/iteration measured); fused, each iteration chains on the
        # previous one at device speed.
        fused_sp = not self.multi_process and not cfg.data_parallel
        fused_dp = not self.multi_process and cfg.data_parallel
        fused_mp = self.multi_process
        fused = True
        num_cells = self.envs_local * cfg.frame_size * cfg.frame_size
        self._delta_floor = 0
        # Floor ratchet cap: the floor is rounded UP to a bucket by
        # pack_delta, so cap it at the largest bucket whose padded upload
        # (3 B/entry) still beats the dense frame size — one busy frame must
        # not pin a permanently-worse-than-dense bucket (ADVICE r2).
        floor_cap = max((b for b in _DELTA_BUCKETS if 3 * b < num_cells),
                        default=0)

        def stage_args(a_np):
            """Engine step + host packing + device staging for one
            iteration. In pipelined mode this runs on the worker thread,
            overlapping the next engine step AND its uploads against the
            main thread's dispatch of the current one (bench.py measured
            the same structure at 68k env-steps/s on this link)."""
            if use_delta:
                counts, dpos, dval, resets, rewards, dones, kinds = \
                    env_step(a_np)
                packed, ridx = pack_resets(resets, kinds)
                if counts is None:  # engine chose the dense fallback
                    is_delta, obs_form = False, (jnp.asarray(dpos),)
                else:
                    # Pin one bucket specialisation: floor at 2x the largest
                    # delta seen so iterations keep hitting one precompiled
                    # program instead of flapping across bucket sizes (each
                    # first-seen bucket costs a full remote compile).
                    ppos, pval = pack_delta(dpos, dval,
                                            min_bucket=self._delta_floor)
                    self._delta_floor = max(
                        self._delta_floor,
                        min(2 * dpos.shape[0], floor_cap))
                    is_delta = True
                    obs_form = (jnp.asarray(counts), jnp.asarray(ppos),
                                jnp.asarray(pval))
            else:
                obs, resets, rewards, dones, kinds = env_step(a_np)
                packed, ridx = pack_resets(resets, kinds)
                is_delta, obs_form = False, (jnp.asarray(obs),)
            return is_delta, (*obs_form, jnp.asarray(packed),
                              jnp.asarray(ridx), jnp.asarray(rewards),
                              jnp.asarray(dones.astype(bool)),
                              jnp.asarray(kinds))

        def fused_dispatch(is_delta, tail, a_exec, stack, num_learns, beta,
                           sync_target):
            fn = train_iter_delta if is_delta else train_iter_packed
            actions, self.agent, stack, self.rep, self.loop_key, loss = fn(
                cfg, self.action_space, num_learns, self.agent, stack,
                self.rep, self.loop_key, a_exec, *tail, np.float32(beta),
                np.bool_(sync_target))
            if num_learns:  # device scalar, fetched lazily by the heartbeat
                self._last_loss = loss
            return actions, stack
        # Depth-D pipeline: seed the queue with D copies of the first action
        # set (a brief startup transient; lag settles to D steps).
        from collections import deque
        action_queue = deque([actions] * max(cfg.pipeline_depth, 1))
        pool = fut = fetch_pool = None
        fetch_q = deque()
        to_host = (local_rows if fused_mp else np.asarray)
        if cfg.pipeline_actor:
            # Overlapped pipeline: the engine computes step t+1 on a worker
            # thread while the main thread stages step t's upload and issues
            # the single fused async device dispatch. The engine's output
            # buffers are double-buffered (envs/engine.py) so step t's
            # arrays stay valid while t+1 writes.
            #
            # Action PREFETCH pool: the device->host action fetch costs a
            # full tunnel RTT on remote links, and paying it inline between
            # the worker's engine jobs made small-env runs fetch-bound (the
            # round-5 suite heartbeats showed fetch=69% of wall at 64
            # envs). Each produced action array's fetch is submitted
            # immediately on its own thread, so up to pipeline_depth
            # fetches overlap each other AND the device chain; the loop
            # then collects a fetch issued D iterations ago.
            pool = ThreadPoolExecutor(1)
            fetch_pool = ThreadPoolExecutor(3)
            pending_a = action_queue.popleft()
            action_queue.append(pending_a)  # keep queue depth D
            for a in list(action_queue):
                fetch_q.append(fetch_pool.submit(to_host, a))
            stage_fn = (stage_args_mp if fused_mp
                        else stage_args_dp if fused_dp else stage_args)
            fut = pool.submit(stage_fn, to_host(pending_a))
        it = 0
        # Schedule marks relative to the current T (exact after resume).
        nxt = lambda interval: ((self.T // interval) + 1) * interval \
            if interval else float("inf")
        next_target_sync = nxt(cfg.target_update)
        next_eval = nxt(cfg.evaluation_interval)
        next_ckpt = nxt(cfg.checkpoint_interval)
        # Replay-bearing saves: either coupled to every eval (reference
        # main.py:172-174) or on their own decoupled interval.
        next_memsave = nxt(cfg.memory_save_interval) \
            if cfg.memory_path is not None else float("inf")
        profiling = False
        self._last_loss = None
        self._settle_q = deque()
        import time as _time
        last_log_t, last_log_T = _time.time(), self.T
        while self.T < cfg.total_steps:
            now = _time.time()
            if now - last_log_t > 60 and self.is_chief:  # throughput heartbeat
                sps = (self.T - last_log_T) / (now - last_log_t)
                if self._last_loss is None:
                    loss_s = ""
                else:
                    lv = self._last_loss
                    if self.multi_process:  # replicated global -> local copy
                        from rainbow_tpu.parallel.multihost import local_value
                        lv = local_value(lv)
                    loss_s = f" | loss: {float(np.asarray(lv)):.4f}"
                log(f"T = {self.T} | {sps:.0f} env-steps/s{loss_s} | "
                    f"{self.timer.summary()}")
                last_log_t, last_log_T = now, self.T
            it += 1
            if cfg.profile:  # trace a steady-state window (SURVEY.md §5)
                if it == 20:
                    jax.profiler.start_trace(
                        os.path.join(self.results_dir, "trace"))
                    profiling = True
                elif it == 40 and profiling:
                    jax.block_until_ready(stack)
                    jax.profiler.stop_trace()
                    profiling = False
                    log(f"Profiler trace written to {self.results_dir}/trace")
            self.T += cfg.num_envs
            learning = self.T >= cfg.learn_start
            do_learn = learning and it % self.iters_per_learn == 0
            if fused:
                num_learns = self.learns_per_iter if do_learn else 0
                beta = min(1.0, cfg.priority_weight
                           + (self.T - cfg.learn_start) * self.beta_rate) \
                    if learning else 0.0
                sync_target = do_learn and self.T >= next_target_sync
            elif do_learn:
                self.agent = ag.reset_noise(self.agent)  # main.py:150-151
            if not learning and it % self.iters_per_learn == 0:
                # The reference redraws noisy weights every replay_frequency
                # steps from T=1 — main.py:150-151 sits OUTSIDE the
                # T >= learn_start gate (main.py:160). Without this the
                # whole warmup explores with ONE frozen noise draw (and,
                # with per_env_noise off, every env acts identically),
                # biasing the replay distribution the first updates see.
                # Tiny host-side key fold: warmup-only, a few dozen
                # iterations, so the extra dispatch is negligible.
                self.agent = ag.reset_noise(self.agent)

            if fused and cfg.pipeline_actor:
                self.timer.start("env")
                staged = fut.result()  # staged step t
                self.timer.stop("env")
                a_exec = pending_a
                pending_a = action_queue.popleft()
                self.timer.start("fetch")
                pa_np = fetch_q.popleft().result()  # prefetched D iters ago
                self.timer.stop("fetch")
                fut = pool.submit(stage_args_mp if fused_mp
                                  else stage_args_dp if fused_dp
                                  else stage_args,
                                  pa_np)  # engine step t+1
                self.timer.start("actor")
                if fused_mp or fused_dp:
                    a_new, stack = fused_dispatch_mp(
                        staged, a_exec, stack, num_learns, beta, sync_target)
                else:
                    is_delta, tail = staged
                    a_new, stack = fused_dispatch(is_delta, tail, a_exec,
                                                  stack, num_learns, beta,
                                                  sync_target)
                action_queue.append(a_new)
                fetch_q.append(fetch_pool.submit(to_host, a_new))
                self.timer.stop("actor")
                # Bounded in-flight window (cfg.settle_window): settle the
                # iteration from W back via a real device→host value fetch.
                # The depth-D action queue alone bounds in-flight programs
                # at D, which for D>=2 already triggers the remote
                # runtime's queueing collapse (bench.py bench_train: 1.2 s
                # vs 0.35 s per identical 1024-env iteration) — this keeps
                # deep action pipelines (cheap fetches) while capping
                # un-settled programs independently.
                self.timer.start("settle")
                h_new = self._last_loss if num_learns else a_new
                if fused_sp and num_learns:
                    # (a_new's copy is already in flight from two lines up)
                    h_new.copy_to_host_async()  # value lands while later
                    # programs run; the pop below then completes without
                    # paying a device->host round trip of its own
                self._settle_q.append(h_new)
                if len(self._settle_q) > max(cfg.settle_window, 0):
                    h = self._settle_q.popleft()
                    if fused_mp or fused_dp:
                        jax.block_until_ready(h)
                    else:
                        np.asarray(h)
                self.timer.stop("settle")
            else:
                self.timer.start("env")
                staged = (stage_args_mp if fused_mp
                          else stage_args_dp if fused_dp
                          else stage_args)(acts_np)
                self.timer.stop("env")
                self.timer.start("actor")
                if fused_mp or fused_dp:
                    actions, stack = fused_dispatch_mp(
                        staged, actions, stack, num_learns, beta, sync_target)
                    acts_np = (local_rows(actions) if fused_mp
                               else np.asarray(actions))
                else:
                    is_delta, tail = staged
                    actions, stack = fused_dispatch(is_delta, tail, actions,
                                                    stack, num_learns, beta,
                                                    sync_target)
                    acts_np = np.asarray(actions)
                self.timer.stop("actor")
            if learning:
                if self.T >= next_target_sync:  # main.py:177-178
                    if fused and sync_target:
                        pass  # synced inside the fused program this iteration
                    else:
                        self.agent = ag.update_target(self.agent)
                    next_target_sync += cfg.target_update

                if self.T >= next_eval:  # main.py:166-174
                    if cfg.async_eval and not self.multi_process:
                        self._eval_async_start(val_states)
                    else:
                        avg_r, avg_q = self.evaluate_now(val_states)
                        if self.is_chief:
                            log(f"T = {self.T} / {cfg.total_steps} | "
                                f"Avg. reward: {avg_r} | Avg. Q: "
                                f"{avg_q:.4f} | {self.timer.summary()}")
                    next_eval += cfg.evaluation_interval
                    if (cfg.memory_path is not None
                            and not cfg.memory_save_interval):
                        self.save_checkpoint("memory_checkpoint.npz",
                                             include_replay=True)
                self._eval_async_drain()

                if self.T >= next_memsave:  # decoupled replay-save cadence
                    self.save_checkpoint("memory_checkpoint.npz",
                                         include_replay=True)
                    next_memsave += cfg.memory_save_interval

                if self.T >= next_ckpt:  # main.py:181-182
                    self.save_checkpoint()
                    next_ckpt += cfg.checkpoint_interval

        if fut is not None:
            fut.result()  # drain the in-flight engine step before close
        if pool is not None:
            pool.shutdown()
        if getattr(self, "_eval_skipped_since", None) is not None:
            # Coalescing skipped at least one scheduled evaluation since the
            # last one ran — close the run with a final forced eval so the
            # end-of-training policy is always measured (the reference's
            # last eval lands at T_max, main.py:166).
            self._eval_async_start(val_states, force=True)
        self._eval_async_drain(wait=True)  # land any in-flight evaluations
        self.env.close()
        return self.metrics
