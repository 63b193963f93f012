"""On-device prioritized n-step replay — the TPU re-architecture of
reference memory.py (SegmentTree + ReplayMemory, memory.py:12-180).

Design (vs the reference's host-side numpy structures):

* **State is a pytree of device arrays**, shaped (num_envs, capacity_per_env):
  each env owns a contiguous ring so frame-stack / n-step windows remain
  contiguous in time even with thousands of envs appending in lockstep. The
  reference's single-env cyclic buffer (memory.py:56-61) is the E=1 case.
* **No materialised sum-tree.** The reference maintains a mutable array-backed
  sum-tree with upward propagation on every write (memory.py:23-54). On TPU,
  rebuilding the tree levels *inside jit at sample time* is a handful of fused
  O(L) reductions (microseconds at HBM bandwidth) and removes all mutable
  tree state: appends and priority updates touch only the flat leaf array.
* **Rejection loop → masking.** The reference re-draws whole batches until no
  index falls in the forbidden window around the write head (memory.py:128-132)
  — data-dependent control flow that cannot jit. Here the forbidden window's
  priorities are masked to zero *before* the stratified draw, so every draw is
  valid by construction and sampling remains exact stratified sampling over
  the valid mass.
* **Store-last-frame trick kept** (memory.py:106): only the newest 84×84 uint8
  frame is stored; the 4-frame stacks and n-step windows are reconstructed at
  sample time by a windowed gather with episode-boundary blanking masks
  derived from ``timestep == 0`` markers, mirroring memory.py:111-121 exactly.
* Priorities are stored already ^ω-applied, as in the reference tree
  (memory.py:157-159), with the same monotone max-priority bookkeeping for
  new appends (memory.py:56-61, 105-107).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    frames: jax.Array       # uint8 (E, C, F*F) newest frame per transition,
                            # stored FLAT so the minor dim (7056) tiles onto
                            # the (sublane, lane) layout without padding (an
                            # (E, C, 84, 84) u8 array pads 1.6x on TPU)
    actions: jax.Array      # int32 (E, C)
    rewards: jax.Array      # float32 (E, C)
    timesteps: jax.Array    # int32 (E, C) per-episode step counter (0 = episode start)
    nonterminal: jax.Array  # bool (E, C)
    priorities: jax.Array   # float32 (E, C), ^ω-space
    index: jax.Array        # int32 scalar — shared ring write head
    full: jax.Array         # bool scalar — ring has wrapped
    t: jax.Array            # int32 (E,) per-env episode timestep counter
    max_priority: jax.Array  # float32 scalar, monotone (reference memory.py:60)


def init_replay(num_envs: int, capacity_per_env: int,
                frame_size: int = 84) -> ReplayState:
    e, c, f = num_envs, capacity_per_env, frame_size
    return ReplayState(
        frames=jnp.zeros((e, c, f * f), jnp.uint8),
        actions=jnp.zeros((e, c), jnp.int32),
        rewards=jnp.zeros((e, c), jnp.float32),
        timesteps=jnp.zeros((e, c), jnp.int32),
        nonterminal=jnp.zeros((e, c), jnp.bool_),
        priorities=jnp.zeros((e, c), jnp.float32),
        index=jnp.zeros((), jnp.int32),
        full=jnp.zeros((), jnp.bool_),
        t=jnp.zeros((e,), jnp.int32),
        max_priority=jnp.ones((), jnp.float32),  # 1 = 1^ω, memory.py:20
    )


def append(state: ReplayState, frames: jax.Array, actions: jax.Array,
           rewards: jax.Array, terminals: jax.Array) -> ReplayState:
    """Append one lockstep transition per env at the shared write head.

    Mirrors reference memory.py:105-108: stores (t, frame, action, reward,
    ¬terminal) at max priority; episode counter resets to 0 on terminal.
    ``frames`` is uint8 (E, 84, 84) — the newest preprocessed frame only.
    """
    i = state.index
    col = lambda arr, v: arr.at[:, i].set(v)
    new_index = (i + 1) % state.priorities.shape[1]
    return state.replace(
        frames=col(state.frames, frames.reshape(frames.shape[0], -1)),
        actions=col(state.actions, actions.astype(jnp.int32)),
        rewards=col(state.rewards, rewards.astype(jnp.float32)),
        timesteps=col(state.timesteps, state.t),
        nonterminal=col(state.nonterminal, ~terminals),
        priorities=col(state.priorities, jnp.full(
            (state.priorities.shape[0],), 1.0) * state.max_priority),
        index=new_index,
        full=state.full | (new_index == 0),
        t=jnp.where(terminals, 0, state.t + 1),
    )


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _stratified_find(leaves: jax.Array, key: jax.Array,
                     batch_size: int) -> Tuple[jax.Array, jax.Array]:
    """Stratified prefix-sum descent over a stateless sum-tree.

    Replaces SegmentTree.find/_retrieve (reference memory.py:64-82): builds
    the tree levels on the fly from ``leaves`` (padded to a power of two) and
    descends all ``batch_size`` stratified draws in parallel, one level per
    unrolled step. Returns (leaf_indices, leaf_values).
    """
    n = leaves.shape[0]
    L = _next_pow2(n)
    padded = jnp.zeros((L,), leaves.dtype).at[:n].set(leaves)
    levels = [padded]
    while levels[-1].shape[0] > 1:
        lv = levels[-1]
        levels.append(lv.reshape(-1, 2).sum(axis=1))
    total = levels[-1][0]
    seg = total / batch_size
    u = jax.random.uniform(key, (batch_size,), jnp.float32)
    values = (jnp.arange(batch_size, dtype=jnp.float32) + u) * seg
    idx = jnp.zeros((batch_size,), jnp.int32)
    # Descend from the root's children to the leaves (reference memory.py:72-76:
    # go right iff value > left-child sum, subtracting the left mass).
    for level in levels[-2::-1]:
        left = level[2 * idx]
        go_right = values > left
        idx = 2 * idx + go_right.astype(jnp.int32)
        values = values - jnp.where(go_right, left, 0.0)
    idx = jnp.minimum(idx, n - 1)  # total-overshoot clamp (memory.py:70-71)
    return idx, padded[idx], total


def _valid_time_mask(capacity: int, index: jax.Array, history: int,
                     n_step: int) -> jax.Array:
    """(C,) bool — sampleable positions, the mask form of the reference's
    rejection conditions (memory.py:131): the (−history+1 .. +n) window around
    a sampled index must not cross the write head."""
    pos = jnp.arange(capacity, dtype=jnp.int32)
    ahead = (index - pos) % capacity   # distance forward to the write head
    behind = (pos - index) % capacity  # distance back from the write head
    return (ahead > n_step) & (behind >= history)


def _blank_masks(firsts: jax.Array, history: int, n_step: int) -> jax.Array:
    """Episode-boundary blanking over a (B, history+n) window of
    ``timestep==0`` markers — exactly reference memory.py:114-120."""
    w = history + n_step
    blank = [jnp.zeros_like(firsts[:, 0]) for _ in range(w)]
    for t in range(history - 2, -1, -1):      # frames before an episode start
        blank[t] = blank[t + 1] | firsts[:, t + 1]
    for t in range(history, history + n_step):  # frames after a terminal
        blank[t] = blank[t - 1] | firsts[:, t]
    return jnp.stack(blank, axis=1)


def _gather_unnormalised(state: ReplayState, idx, p, total, beta,
                         history: int, n_step: int, discount: float,
                         states_uint8: bool = False):
    """Windowed gather + batch assembly for sampled flat indices ``idx``;
    weights are UNNORMALISED (callers divide by their own batch max)."""
    E, C = state.priorities.shape
    e, i = idx // C, idx % C

    # Windowed gather: offsets −history+1 .. n relative to the sampled index
    # (reference memory.py:111-113).
    offs = jnp.arange(-history + 1, n_step + 1, dtype=jnp.int32)
    wi = (i[:, None] + offs[None, :]) % C
    eb = e[:, None]
    frames_w = state.frames[eb, wi]          # (B, h+n, F*F) uint8
    ts_w = state.timesteps[eb, wi]
    rew_w = state.rewards[eb, wi]
    act_w = state.actions[eb, wi]
    nt_w = state.nonterminal[eb, wi]

    blank = _blank_masks(ts_w == 0, history, n_step)
    frames_w = jnp.where(blank[:, :, None], jnp.uint8(0), frames_w)
    rew_w = jnp.where(blank, 0.0, rew_w)
    nt_w = jnp.where(blank, False, nt_w)

    f = int(round(frames_w.shape[-1] ** 0.5))

    def to_state(fr):  # (B, T, F*F) -> (B, F, F, T), uint8 or [0,1] float
        fr = fr.reshape(fr.shape[0], fr.shape[1], f, f)
        fr = jnp.transpose(fr, (0, 2, 3, 1))
        return fr if states_uint8 else fr.astype(jnp.float32) / 255.0
    states = to_state(frames_w[:, :history])
    next_states = to_state(frames_w[:, n_step:n_step + history])
    actions = act_w[:, history - 1]
    # Truncated n-step return Σ γ^k R_{t+k+1} (reference memory.py:141-143).
    gammas = discount ** jnp.arange(n_step, dtype=jnp.float32)
    returns = rew_w[:, history - 1:history - 1 + n_step] @ gammas
    nonterminals = nt_w[:, history + n_step - 1].astype(jnp.float32)

    # IS weights (N·p)^−β — reference memory.py:149-154. N = number of
    # stored transitions (capacity if full else index), scaled by env count.
    stored = jnp.where(state.full, C, state.index) * E
    probs = p / jnp.maximum(total, 1e-12)
    weights = (stored.astype(jnp.float32) * probs) ** (-beta)
    # Guards: zero-mass boundary hits get zero weight, and an all-invalid
    # buffer (sampled before learn_start would gate it — the case where the
    # reference's rejection loop at memory.py:128-132 would spin forever)
    # degrades to all-zero weights instead of NaN.
    weights = jnp.where((p > 0) & (total > 0), weights, 0.0)
    return {
        "idxs": idx, "states": states, "actions": actions,
        "returns": returns, "next_states": next_states,
        "nonterminals": nonterminals, "weights": weights,
    }


def _masked_flat_priorities(state: ReplayState, history: int, n_step: int):
    E, C = state.priorities.shape
    tvalid = _valid_time_mask(C, state.index, history, n_step)
    return jnp.where(tvalid[None, :], state.priorities, 0.0).reshape(-1)


@functools.partial(jax.jit, static_argnames=("batch_size", "history",
                                             "n_step", "discount"))
def sample(state: ReplayState, key: jax.Array, beta: jax.Array,
           *, batch_size: int, history: int, n_step: int,
           discount: float):
    """Sample a prioritized batch. Returns a dict with
    idxs (flat leaf indices for update_priorities), states/next_states
    (B, 84, 84, history) float32 NHWC in [0,1], actions (B,), returns (B,),
    nonterminals (B,), weights (B,).

    Mirrors reference memory.py:124-155 (stratified segments, IS weights
    normalised by the batch max) with the rejection loop replaced by masking.
    """
    flat = _masked_flat_priorities(state, history, n_step)
    idx, p, total = _stratified_find(flat, key, batch_size)
    out = _gather_unnormalised(state, idx, p, total, beta, history, n_step,
                               discount)
    weights_max = jnp.maximum(jnp.max(out["weights"]), 1e-12)
    out["weights"] = out["weights"] / weights_max
    # Pre-normalisation max, so a sharded learner can renormalise by the
    # GLOBAL batch max (pmax) for exact parity with the reference's
    # single-batch normalisation (memory.py:153).
    out["weights_max"] = weights_max
    return out


@functools.partial(jax.jit, static_argnames=("num_batches", "batch_size",
                                             "history", "n_step", "discount",
                                             "states_uint8"))
def sample_many(state: ReplayState, key: jax.Array, beta: jax.Array,
                *, num_batches: int, batch_size: int, history: int,
                n_step: int, discount: float, states_uint8: bool = False):
    """Draw a whole learner round's batches in ONE stratified pass against
    the current priority snapshot: num_batches·batch_size stratified
    segments, one windowed gather, fields returned with leading shape
    (num_batches, batch_size, ...).

    Segment j of the global stratification goes to batch j % num_batches, so
    every batch's draws still span the full priority mass uniformly (batch k
    gets segments {k, k+num_batches, k+2·num_batches, ...}). IS weights are
    normalised per batch by that batch's max, matching the reference's
    per-batch normalisation (memory.py:153).

    states_uint8=True keeps states/next_states as raw uint8 stacks (the
    blanked frame windows, pre-transpose to NHWC) so a big round's staged
    batches cost 1/4 the HBM; consumers convert per scan step."""
    B = num_batches * batch_size
    flat = _masked_flat_priorities(state, history, n_step)
    idx, p, total = _stratified_find(flat, key, B)
    out = _gather_unnormalised(state, idx, p, total, beta, history, n_step,
                               discount, states_uint8=states_uint8)

    def resh(x):  # (B, ...) -> (num_batches, batch_size, ...)
        x = x.reshape((batch_size, num_batches) + x.shape[1:])
        return jnp.swapaxes(x, 0, 1)
    out = {k: resh(v) for k, v in out.items()}
    wmax = jnp.maximum(out["weights"].max(axis=1, keepdims=True), 1e-12)
    out["weights"] = out["weights"] / wmax
    out["weights_max"] = wmax[:, 0]
    return out


def states_to_float(stacks: jax.Array) -> jax.Array:
    """uint8 (B, F, F, H) stacks -> float32 in [0,1] (reference env.py:29)."""
    return stacks.astype(jnp.float32) / 255.0


def update_priorities(state: ReplayState, idxs: jax.Array,
                      losses: jax.Array,
                      priority_exponent: float) -> ReplayState:
    """Write back new priorities ``loss^ω`` for the sampled leaves
    (reference memory.py:157-159) and bump the monotone max."""
    C = state.priorities.shape[1]
    p = losses ** priority_exponent
    new = state.priorities.at[idxs // C, idxs % C].set(p)
    return state.replace(priorities=new,
                         max_priority=jnp.maximum(state.max_priority,
                                                  jnp.max(p)))


def stored_count(state: ReplayState) -> jax.Array:
    E, C = state.priorities.shape
    return jnp.where(state.full, C, state.index) * E


def all_states(state: ReplayState, history: int) -> jax.Array:
    """Every stored frame-stack, (E*C, 84, 84, history) float32 NHWC — the
    validation-scan iterator of reference memory.py:162-180, vectorised.
    Blanks stacks across episode starts exactly as the reference does
    (backward pass over ``timestep==0`` markers only)."""
    E, C = state.priorities.shape
    i = jnp.arange(C, dtype=jnp.int32)
    offs = jnp.arange(-history + 1, 1, dtype=jnp.int32)
    wi = (i[:, None] + offs[None, :]) % C          # (C, h)
    frames_w = state.frames[:, wi]                 # (E, C, h, F*F)
    ts_w = state.timesteps[:, wi]                  # (E, C, h)
    firsts = (ts_w == 0).reshape(E * C, history)
    blank = [jnp.zeros_like(firsts[:, 0]) for _ in range(history)]
    for t in range(history - 2, -1, -1):
        blank[t] = blank[t + 1] | firsts[:, t + 1]
    blank = jnp.stack(blank, axis=1)
    f = int(round(frames_w.shape[-1] ** 0.5))
    fr = frames_w.reshape(E * C, history, f, f)
    fr = jnp.where(blank[:, :, None, None], jnp.uint8(0), fr)
    return jnp.transpose(fr, (0, 2, 3, 1)).astype(jnp.float32) / 255.0
