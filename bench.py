"""Benchmark: batched actor-learner throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

metric = aggregate env-steps/s of the batched actor path (fused XLA actor
program + C++ batched engine). vs_baseline = speedup over the
reference-architecture loop (single env, batch-1 act, per-step host
dispatches — the shape of reference main.py:146-158) measured on the same
hardware in the same process. Learner updates/s is measured too and reported
on stderr.

Env knobs: BENCH_ENVS (default 1024), BENCH_ITERS (default 60),
BENCH_GAME (default pong), BENCH_PLATFORM (force e.g. cpu),
BENCH_SETTLE (train-mode in-flight window, default 2 — see bench_train),
BENCH_DEPTH (action-pipeline depth, default 3), BENCH_TRAIN_VERBOSE
(per-iteration train-mode timings on stderr).
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
    """Ask the engine (it knows every catalogued game's minimal action set —
    the old hardcoded 14-game map KeyError'd on newer games)."""
    from rainbow_tpu.envs import engine

    probe = engine.BatchedEnv(game, num_envs=1, seed=0)
    try:
        return probe.action_space
    finally:
        probe.close()


# ---- analytic flops / MFU accounting (VERDICT r2 item 2) -------------------
def forward_flops_per_sample(cfg, A):
    """Analytic forward-pass flops (2·MACs) for one input sample through the
    DQN net (reference model.py:55-67 shapes): convs + the four noisy-linear
    layers (each a μ- and a σ-matmul, so 2× a dense layer's MACs)."""
    if cfg.architecture == "canonical":
        convs = [(cfg.history_length, 32, 8, 4), (32, 64, 4, 2),
                 (64, 64, 3, 1)]
    else:
        convs = [(cfg.history_length, 32, 5, 5), (32, 64, 5, 5)]
    macs, s = 0, cfg.frame_size
    for cin, cout, k, st in convs:
        s = (s - k) // st + 1
        macs += s * s * cout * k * k * cin
    h, flat = cfg.hidden_size, cfg.conv_output_size
    macs += 2 * (flat * h) * 2                       # fc_h_v + fc_h_a (noisy)
    macs += 2 * (h * cfg.atoms) + 2 * (h * A * cfg.atoms)  # fc_z_v + fc_z_a
    return 2 * macs


def learn_flops_per_update(cfg, A):
    """One C51 update = 3 forwards (online grad fwd, online next-state,
    target next-state — reference agent.py:66-76) + backward ≈ 2 forwards,
    all at batch_size: 5 forward-equivalents."""
    return 5 * cfg.batch_size * forward_flops_per_sample(cfg, A)


def peak_flops_per_s():
    """Chip peak for MFU math. Matmuls run on the MXU in bf16 passes on this
    platform; override with BENCH_PEAK_FLOPS for other chips."""
    if os.environ.get("BENCH_PEAK_FLOPS"):
        return float(os.environ["BENCH_PEAK_FLOPS"])
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12  # TPU v5e bf16 peak
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    return 197e12


def bench_batched(cfg, game, num_envs, iters, pipeline=False, depth=1,
                  delta=False):
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from rainbow_tpu.train import (_DELTA_BUCKETS, actor_step_delta,
                                    actor_step_packed, pack_delta,
                                    pack_resets, update_step_delta,
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
    num_cells = num_envs * cfg.frame_size * cfg.frame_size
    floor_cap = max((b for b in _DELTA_BUCKETS if 3 * b < num_cells),
                    default=0)
    # Pin one delta-bucket specialisation: observe typical delta sizes during
    # warmup and floor the bucket at 2x the largest seen (capped so the
    # pinned bucket's 3 B/entry upload always beats dense), so measurement
    # iterations hit a single precompiled program.
    delta_floor = [0]

    def delta_args(a_np):
        counts, dpos, dval, resets, rewards, dones, kinds = \
            env.step_delta(a_np)
        packed, ridx = pack_resets(resets, kinds)
        if counts is None:  # engine chose the dense fallback
            return False, ((jnp.asarray(dpos), jnp.asarray(packed),
                            jnp.asarray(ridx), jnp.asarray(rewards),
                            jnp.asarray(dones.astype(bool)),
                            jnp.asarray(kinds)))
        ppos, pval = pack_delta(dpos, dval, min_bucket=delta_floor[0])
        delta_floor[0] = max(delta_floor[0],
                             min(2 * dpos.shape[0], floor_cap))
        return True, ((jnp.asarray(counts), jnp.asarray(ppos),
                       jnp.asarray(pval),
                       jnp.asarray(packed), jnp.asarray(ridx),
                       jnp.asarray(rewards), jnp.asarray(dones.astype(bool)),
                       jnp.asarray(kinds)))

    def dense_args(a_np):
        obs, resets, rewards, dones, kinds = env.step(a_np)
        packed, ridx = pack_resets(resets, kinds)
        return False, ((jnp.asarray(obs), jnp.asarray(packed),
                        jnp.asarray(ridx), jnp.asarray(rewards),
                        jnp.asarray(dones.astype(bool)), jnp.asarray(kinds)))

    step_args = delta_args if delta else dense_args

    def dispatch(is_delta, tail, a_exec, stack, rep):
        fn = actor_step_delta if is_delta else actor_step_packed
        return fn(agent.params, agent.noise_key, cfg, A, stack, rep, a_exec,
                  *tail)

    def serial_iter(stack, rep):
        nonlocal actions, acts_np
        is_d, tail = step_args(acts_np)
        actions, stack, rep = dispatch(is_d, tail, actions, stack, rep)
        acts_np = np.asarray(actions)
        return stack, rep

    # Overlapped pipeline: engine step t+1 runs on the worker thread while
    # the main thread dispatches the ONE fused program for step t; the
    # depth-D queue keeps action fetches settled (free).
    pending = {"a": None, "fut": None}

    def pipelined_iter(stack, rep):
        if pending["fut"] is None:  # prime
            pending["a"] = queue.popleft()
            queue.append(pending["a"])
            pending["fut"] = pool.submit(step_args, np.asarray(pending["a"]))
        is_d, tail = pending["fut"].result()
        a_exec = pending["a"]
        pending["a"] = queue.popleft()
        pa_np = np.asarray(pending["a"])  # settled fetch
        pending["fut"] = pool.submit(step_args, pa_np)
        a_new, stack, rep = dispatch(is_d, tail, a_exec, stack, rep)
        a_new.copy_to_host_async()
        queue.append(a_new)
        return stack, rep

    one_iter = pipelined_iter if pipeline else serial_iter
    for _ in range(6 if delta else 3):  # warmup (compile; delta mode also
        stack, rep = one_iter(stack, rep)  # settles the pinned delta bucket)
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
            if delta:
                ppos, pval = pack_delta(
                    np.zeros((0,), np.uint16), np.zeros((0,), np.uint8),
                    min_bucket=delta_floor[0])
                obs_form = (jnp.zeros(num_envs, jnp.int32),
                            jnp.asarray(ppos), jnp.asarray(pval))
            else:
                obs_form = (jnp.zeros((num_envs, 84, 84), jnp.uint8),)
            tail = (*obs_form, jnp.asarray(packed), jnp.asarray(ridx),
                    jnp.zeros(num_envs), jnp.zeros(num_envs, bool),
                    jnp.asarray(kinds))
            actions_, stack, rep = dispatch(
                delta, tail, jnp.zeros(num_envs, jnp.int32), stack, rep)
    jax.block_until_ready(stack)
    t0 = time.perf_counter()
    for _ in range(iters):
        stack, rep = one_iter(stack, rep)
    jax.block_until_ready(stack)
    dt = time.perf_counter() - t0
    if pending["fut"] is not None:
        pending["fut"].result()  # drain the in-flight engine step
    env.close()
    if pool:
        pool.shutdown()
    return num_envs * iters / dt, (agent, rep, A)


def bench_train(cfg, game, num_envs, iters, depth=3, delta=True):
    """END-TO-END training throughput (VERDICT r2 item 1): the Trainer's
    fused single-process fast path — engine step + upload staging overlapped
    on a worker thread, ONE fused device program per iteration carrying the
    full learns_per_iter scanned C51 learner round, target sync at the
    canonical cadence (reference main.py:142-184's loop, batched). This is
    the number a real training run sustains, unlike the actor-only modes."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from rainbow_tpu.train import (_DELTA_BUCKETS, pack_delta, pack_resets,
                                    train_iter_delta, train_iter_packed)

    env = BatchedEnv(game, num_envs, seed=1)
    A = env.action_space
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(num_envs, cfg.capacity_per_env, cfg.frame_size)
    stack = init_framestack(num_envs, cfg.history_length,
                            jnp.asarray(env.reset_all()))
    loop_key = jax.random.key(7)
    actions = ag.act(agent.params, cfg, A, to_network_input(stack),
                     agent.noise_key)
    learns_per_iter = max(num_envs // cfg.replay_frequency, 1)
    sync_every = max(cfg.target_update // num_envs, 1)  # iters per hard sync
    num_cells = num_envs * cfg.frame_size * cfg.frame_size
    floor_cap = max((b for b in _DELTA_BUCKETS if 3 * b < num_cells),
                    default=0)
    delta_floor = [0]

    def stage(a_np):
        if delta:
            counts, dpos, dval, resets, rewards, dones, kinds = \
                env.step_delta(a_np)
            packed, ridx = pack_resets(resets, kinds)
            if counts is not None:
                ppos, pval = pack_delta(dpos, dval, min_bucket=delta_floor[0])
                delta_floor[0] = max(delta_floor[0],
                                     min(2 * dpos.shape[0], floor_cap))
                return True, (jnp.asarray(counts), jnp.asarray(ppos),
                              jnp.asarray(pval), jnp.asarray(packed),
                              jnp.asarray(ridx), jnp.asarray(rewards),
                              jnp.asarray(dones.astype(bool)),
                              jnp.asarray(kinds))
            obs = dpos  # dense fallback
        else:
            obs, resets, rewards, dones, kinds = env.step(a_np)
            packed, ridx = pack_resets(resets, kinds)
        return False, (jnp.asarray(obs), jnp.asarray(packed),
                       jnp.asarray(ridx), jnp.asarray(rewards),
                       jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))

    state = {"agent": agent, "rep": rep, "stack": stack, "key": loop_key}

    def dispatch(is_delta, tail, a_exec, num_learns, sync):
        fn = train_iter_delta if is_delta else train_iter_packed
        a_new, state["agent"], state["stack"], state["rep"], state["key"], \
            loss = fn(cfg, A, num_learns, state["agent"], state["stack"],
                      state["rep"], state["key"], a_exec, *tail,
                      np.float32(0.5), np.bool_(sync))
        return a_new, loss

    pool = ThreadPoolExecutor(1)
    queue = deque([actions] * max(depth, 1))
    pending_a = queue.popleft()
    queue.append(pending_a)
    fut = pool.submit(stage, np.asarray(pending_a))
    it = [0]

    def one_iter(num_learns):
        it[0] += 1
        is_d, tail = fut2["f"].result()
        a_exec = pending["a"]
        pending["a"] = queue.popleft()
        pa_np = np.asarray(pending["a"])  # settled (depth-D queue)
        fut2["f"] = pool.submit(stage, pa_np)
        a_new, loss = dispatch(is_d, tail, a_exec, num_learns,
                               num_learns and it[0] % sync_every == 0)
        a_new.copy_to_host_async()
        queue.append(a_new)
        return loss

    pending = {"a": pending_a}
    fut2 = {"f": fut}
    # Warmup: fill the replay past the valid-sample window with the no-learn
    # specialisation, then compile + settle the learning program.
    for _ in range(12):
        one_iter(0)
    loss = None
    for _ in range(4):
        loss = one_iter(learns_per_iter)
    np.asarray(loss)  # REAL settlement (see bench_learner note)
    # Freeze the sparse-delta bucket at its cap for the timed loop: the
    # adaptive ratchet otherwise grows the padded shape mid-loop and every
    # growth is a fresh jit specialisation — one remote compile (~60 s)
    # inside the measurement (observed: a 66 s 'iteration' in a 125 ms/iter
    # steady state). Two more warm iterations compile the pinned shape.
    delta_floor[0] = floor_cap
    for _ in range(2):
        loss = one_iter(learns_per_iter)
    np.asarray(loss)
    verbose = os.environ.get("BENCH_TRAIN_VERBOSE")
    # Bounded in-flight window: settle the loss of iteration i-W at
    # iteration i. Unbounded async dispatch (the r2 structure) collapses
    # ~3x on the remote runtime — queueing many un-settled fused programs
    # with their uploads degrades device-side scheduling (measured 1.2 s vs
    # 0.35 s per identical iteration). W=1 keeps one program executing
    # while the next one's engine step + staging proceed on the host.
    window = int(os.environ.get("BENCH_SETTLE", 2))
    settle_q = deque()
    t0 = time.perf_counter()
    for i in range(iters):
        ti = time.perf_counter()
        loss = one_iter(learns_per_iter)
        loss.copy_to_host_async()  # async: the pop below finds it landed
        settle_q.append(loss)
        if len(settle_q) > window:
            np.asarray(settle_q.popleft())
        if verbose:
            info(f"  iter {i}: {(time.perf_counter() - ti) * 1000:.1f} ms")
    loss = float(np.asarray(loss))
    dt = time.perf_counter() - t0
    fut2["f"].result()
    env.close()
    pool.shutdown()
    sps = num_envs * iters / dt
    updates_ps = learns_per_iter * iters / dt
    flops = (iters * num_envs * forward_flops_per_sample(cfg, A)
             + iters * learns_per_iter * learn_flops_per_update(cfg, A))
    return sps, updates_ps, flops / dt / peak_flops_per_s(), loss


def bench_decompose(cfg, game, num_envs, iters):
    """Decomposed actor-throughput ceilings (VERDICT r1 item 1): which term
    binds — the C++ engine, the host->device upload, the per-dispatch RTT,
    or the on-chip fused program. Returns a dict of env-steps/s numbers."""
    import functools

    from rainbow_tpu.ops.preprocess import update_framestack
    from rainbow_tpu.train import _update_core

    out = {"num_envs": num_envs}
    A = game_action_space(game)
    rng = np.random.default_rng(0)

    # --- 1. raw engine throughput, zero device work ----------------------
    env = BatchedEnv(game, num_envs, seed=3)
    env.reset_all()
    acts = rng.integers(0, A, num_envs).astype(np.int32)
    for _ in range(3):
        env.step(acts)
    t0 = time.perf_counter()
    for _ in range(iters):
        env.step(acts)
    out["engine_dense"] = num_envs * iters / (time.perf_counter() - t0)
    for _ in range(2):
        env.step_delta(acts)
    t0 = time.perf_counter()
    total_px = 0
    for _ in range(iters):
        didx, _dv, *_rest = env.step_delta(acts)
        total_px += didx.shape[0]
    out["engine_delta"] = num_envs * iters / (time.perf_counter() - t0)
    out["delta_px_per_env"] = total_px / (iters * num_envs)
    env.close()

    # --- 2. upload: CONSUME-VERIFIED wire rate. block_until_ready on a bare
    # device_put measures only enqueue/staging on this platform (the r1
    # "1.6 GB/s" artifact); a program that reads the data then returns a
    # tiny result measures the actual wire. Fetches use the settled-async
    # fast path (np.asarray after copy_to_host_async).
    g = jax.jit(lambda o: o.astype(jnp.float32).sum()[None])
    obs = rng.integers(0, 255, (num_envs, 84, 84)).astype(np.uint8)
    s = g(jnp.asarray(obs)); s.copy_to_host_async(); np.asarray(s)
    n_up = max(8, iters // 4)
    t0 = time.perf_counter()
    for i in range(n_up):
        obs[0, 0, 0] = i  # defeat any caching
        s = g(jnp.asarray(obs)); s.copy_to_host_async(); np.asarray(s)
    dt = time.perf_counter() - t0
    out["upload_dense"] = num_envs * n_up / dt
    out["upload_MBps"] = num_envs * 7056 * n_up / dt / 1e6

    # --- 3. dispatch round-trip (async-copy fetch, the fast path) --------
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x); y.copy_to_host_async(); np.asarray(y)
    out["dispatch_rtt_ms"] = (time.perf_counter() - t0) / iters * 1e3

    # --- 4. on-chip ceiling: K fused actor steps as ONE scanned program,
    # observations synthesised on device (no host traffic at all) ---------
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(num_envs, cfg.capacity_per_env, cfg.frame_size)
    stack = init_framestack(
        num_envs, cfg.history_length,
        jnp.asarray(rng.integers(0, 255, (num_envs, 84, 84), np.uint8)))

    @functools.partial(jax.jit, static_argnames=("k_steps",),
                       donate_argnames=("stack", "rep"))
    def synth_rounds(params, noise_key, stack, rep, actions, k_steps):
        def body(carry, t):
            stack, rep, actions = carry
            obs = stack[..., -1] + jnp.uint8(1)  # synthetic next frame
            zeros = jnp.zeros(stack.shape[0])
            stack, rep = _update_core(
                cfg, stack, rep, actions, obs, jnp.zeros_like(obs), zeros,
                zeros.astype(bool), jnp.zeros(stack.shape[0], jnp.uint8))
            acts = ag.act(params, cfg, A,
                          to_network_input(stack),
                          jax.random.fold_in(noise_key, t))
            return (stack, rep, acts), None
        (stack, rep, actions), _ = jax.lax.scan(
            body, (stack, rep, actions), jnp.arange(k_steps))
        return stack, rep, actions

    k_steps = 8
    actions = jnp.zeros((num_envs,), jnp.int32)
    stack, rep, actions = synth_rounds(agent.params, agent.noise_key, stack,
                                       rep, actions, k_steps)  # compile
    np.asarray(actions)  # real settlement
    rounds = max(2, iters // k_steps)
    t0 = time.perf_counter()
    for _ in range(rounds):
        stack, rep, actions = synth_rounds(agent.params, agent.noise_key,
                                           stack, rep, actions, k_steps)
    np.asarray(actions)  # real settlement
    out["onchip_synthetic"] = (num_envs * rounds * k_steps
                               / (time.perf_counter() - t0))
    # Single-step dispatch variant: the same program without the scan, so the
    # gap to onchip_synthetic isolates per-dispatch overhead.
    stack, rep, actions = synth_rounds(agent.params, agent.noise_key, stack,
                                       rep, actions, 1)  # compile k=1
    np.asarray(actions)  # real settlement
    t0 = time.perf_counter()
    for i in range(iters):
        stack, rep, actions = synth_rounds(agent.params, agent.noise_key,
                                           stack, rep, actions, 1)
    np.asarray(actions)  # real settlement
    out["onchip_per_dispatch"] = num_envs * iters / (time.perf_counter() - t0)
    return out


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
    """NOTE: settlement is forced by FETCHING the loss value (np.asarray),
    not jax.block_until_ready — on the axon remote platform the latter can
    return before execution finishes, which inflated the r1/r2 learner
    numbers (18-39k 'updates/s' were dispatch-rate phantoms; the true rate
    is measured here via a real device->host data dependency)."""
    key = jax.random.key(5)
    agent, rep, loss = learner_round(agent, rep, cfg, A, learns_per_round,
                                     jnp.float32(0.5), key)  # compile
    np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(rounds):
        agent, rep, loss = learner_round(agent, rep, cfg, A,
                                         learns_per_round, jnp.float32(0.5),
                                         jax.random.key(10 + i))
    loss_v = float(np.asarray(loss))  # forces the whole donated chain
    dt = time.perf_counter() - t0
    return rounds * learns_per_round / dt, loss_v


def main():
    num_envs = int(os.environ.get("BENCH_ENVS", 1024))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    game = os.environ.get("BENCH_GAME", "pong")
    if os.environ.get("BENCH_DECOMPOSE"):
        cfg = rainbow_tpu.canonical(
            num_envs=num_envs,
            memory_capacity=min(num_envs * 1024, 1_000_000), batch_size=32)
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.cache/rainbow_tpu/jax"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass
        info(f"devices: {jax.devices()}")
        out = bench_decompose(cfg, game, num_envs, iters)
        for k, v in out.items():
            info(f"decompose {k}: {v:.1f}" if isinstance(v, float)
                 else f"decompose {k}: {v}")
        print(json.dumps({"metric": "decompose", **{
            k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in out.items()}}))
        return
    cfg = rainbow_tpu.canonical(
        num_envs=num_envs,
        # canonical 1M total capacity, capped so extreme env counts (the
        # 4096-env stress config) keep the replay within one chip's HBM
        memory_capacity=min(num_envs * 1024, 1_000_000),
        batch_size=32)
    try:  # persistent compile cache: repeated bench runs skip recompiles
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/rainbow_tpu/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    info(f"devices: {jax.devices()}")

    A = game_action_space(game)
    lfpu = learn_flops_per_update(cfg, A)
    peak = peak_flops_per_s()
    # Learner first, on its own fresh state (a multi-GB actor replay left
    # resident alongside skews the measurement badly).
    updates_ps = 0.0
    if not os.environ.get("BENCH_SKIP_LEARNER"):
        agent, rep = make_learner_state(cfg, A, num_envs)
        updates_ps, last_loss = bench_learner(cfg, agent, rep, A)
        info(f"learner: {updates_ps:.1f} updates/s (batch {cfg.batch_size}, "
             f"replay {num_envs}x{cfg.capacity_per_env}), "
             f"mfu={updates_ps * lfpu / peak:.3f}, loss={last_loss:.3f}")
        del agent, rep

    # END-TO-END: the fused training loop with the learner live — the
    # product's real number and the headline metric (VERDICT r2 item 1).
    train_sps = train_mfu = train_ups = 0.0
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        train_sps, train_ups, train_mfu, tloss = bench_train(
            cfg, game, num_envs, iters)
        info(f"TRAIN (fused actor+learner, replay ratio "
             f"{cfg.batch_size}/{cfg.replay_frequency}): {train_sps:.0f} "
             f"env-steps/s @ {num_envs} envs | {train_ups:.0f} updates/s "
             f"interleaved | mfu={train_mfu:.3f} | loss={tloss:.3f}")

    # Throughput preset (config.throughput): same sample replay ratio via
    # 8x-wider, 8x-fewer updates — the learner is kernel-latency-bound, so
    # this amortises the serial kernel chain (6.8 vs 20.6 us/sample measured
    # batch-256 vs batch-32). Opt-in and quality-gated (docs/results_r4).
    tp_sps = tp_ups = tp_mfu = 0.0
    if not os.environ.get("BENCH_SKIP_TP"):
        tp_cfg = rainbow_tpu.throughput(
            num_envs=num_envs,
            memory_capacity=min(num_envs * 1024, 1_000_000))
        tp_sps, tp_ups, tp_mfu, tp_loss = bench_train(
            tp_cfg, game, num_envs, iters)
        info(f"TRAIN [throughput preset] (batch {tp_cfg.batch_size}, one "
             f"update per {tp_cfg.replay_frequency} env-steps): "
             f"{tp_sps:.0f} env-steps/s @ {num_envs} envs | {tp_ups:.0f} "
             f"updates/s | mfu={tp_mfu:.3f} | loss={tp_loss:.3f}")

    if os.environ.get("BENCH_SKIP_SERIAL"):
        batched_sps = 0.0
    else:
        batched_sps, state = bench_batched(cfg, game, num_envs, iters)
        info(f"batched actor (serial): {batched_sps:.0f} env-steps/s "
             f"@ {num_envs} envs")
        del state  # free the multi-GB replay before the next allocation
    depth = int(os.environ.get("BENCH_DEPTH", 3))
    piped_sps, state = bench_batched(cfg, game, num_envs, iters,
                                     pipeline=True, depth=depth)
    info(f"batched actor (pipelined, depth {depth}): {piped_sps:.0f} "
         f"env-steps/s @ {num_envs} envs")
    batched_sps = max(batched_sps, piped_sps)
    del state
    if not os.environ.get("BENCH_SKIP_DELTA"):
        delta_sps, state = bench_batched(cfg, game, num_envs, iters,
                                         pipeline=True, depth=depth,
                                         delta=True)
        info(f"batched actor (pipelined + sparse-delta uploads): "
             f"{delta_sps:.0f} env-steps/s @ {num_envs} envs")
        batched_sps = max(batched_sps, delta_sps)
        del state

    single_cfg = cfg.replace(num_envs=1)
    single_sps = bench_single_env_reference_style(
        single_cfg, game, max(10, iters // 3))
    info(f"reference-style single env: {single_sps:.1f} env-steps/s")

    # Headline: best full-training configuration (canonical, or the
    # quality-gated throughput preset — both sustain the same sampled
    # replay ratio; per-preset numbers are reported alongside).
    headline = max(train_sps, tp_sps) if (train_sps or tp_sps) \
        else batched_sps
    headline_preset = ("throughput" if tp_sps >= train_sps else "canonical") \
        if (train_sps or tp_sps) else "actor-only"
    print(json.dumps({
        "metric": "train_env_steps_per_s" if (train_sps or tp_sps)
                  else "env_steps_per_s",
        "value": round(headline, 1),
        # Which config produced `value` — the headline reflects different
        # hyperparameters per preset, so cross-round comparisons need this
        # (ADVICE r4).
        "headline_preset": headline_preset,
        "unit": "env-steps/s",
        "vs_baseline": round(headline / max(single_sps, 1e-9), 2),
        "train_canonical_env_steps_per_s": round(train_sps, 1),
        "train_throughput_preset_env_steps_per_s": round(tp_sps, 1),
        "actor_only_env_steps_per_s": round(batched_sps, 1),
        "learner_updates_per_s": round(updates_ps, 1),
        "train_updates_per_s": round(train_ups, 1),
        "train_tp_updates_per_s": round(tp_ups, 1),
        "mfu_train": round(train_mfu, 4),
        "mfu_train_tp": round(tp_mfu, 4),
        "mfu_learner": round(updates_ps * lfpu / peak, 4),
    }))


if __name__ == "__main__":
    main()
