"""Rainbow agent — functional core (act / fused learn / target sync).

Re-architecture of reference agent.py:12-118. The reference's learn path is a
chain of host-driven torch calls (sample → 3 forwards → autograd → Adam →
priority write-back, agent.py:61-100); here the *entire* chain, including the
replay sample and the priority update, is one jit-compiled XLA program
(``learn_step``), so a learner iteration is a single device dispatch.

Noise handling: the reference mutates per-layer noise buffers
(agent.py:49-50, 74). Here every forward takes a PRNG key; "resetting noise"
is folding a counter into the agent's noise key. Within one learn step the
online net uses the *current* act-noise key for both its forwards (matching
the reference, where act-time noise is still loaded during learn — reference
main.py:150-153 resets noise on the same step learn runs), and the target net
gets a fresh key (agent.py:74).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rainbow_tpu.config import RainbowConfig
from rainbow_tpu.models.dqn import apply_dqn, init_dqn_params, q_values
from rainbow_tpu.ops.c51 import c51_loss, project_distribution, support_vector
from rainbow_tpu.replay import prioritized as replay


@struct.dataclass
class AgentState:
    params: dict
    target_params: dict
    opt_state: optax.OptState
    noise_key: jax.Array   # current online-net noise (advanced by reset_noise)
    rng: jax.Array         # general-purpose stream (sampling, target noise)
    step: jax.Array        # learner step counter


def make_optimizer(cfg: RainbowConfig) -> optax.GradientTransformation:
    """Global-norm clip (10) + Adam(6.25e-5, eps 1.5e-4) — reference
    agent.py:46, agent.py:97-98, main.py:43-47.

    Round 3 wrapped the chain in optax.flatten to cut kernel count; the
    round-5 trace showed the flatten\'s per-update ravel concatenate alone
    costing 0.155 ms/update (40 ms of a 210 ms canonical iteration at 1024
    envs) while current XLA fuses the per-leaf chain better anyway:
    unflattened measured 170 ms/iteration vs 210 flattened on the same
    workload. Mathematically identical either way; adapt_opt_state migrates
    checkpoints between the two layouts."""
    mu_dtype = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None
    return optax.chain(
        optax.clip_by_global_norm(cfg.norm_clip),
        optax.adam(cfg.learning_rate, eps=cfg.adam_eps, mu_dtype=mu_dtype),
    )


def init_agent(key: jax.Array, cfg: RainbowConfig,
               action_space: int) -> AgentState:
    k_params, k_noise, k_rng = jax.random.split(key, 3)
    params = init_dqn_params(k_params, cfg, action_space)
    opt = make_optimizer(cfg)
    return AgentState(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),  # hard sync, agent.py:41
        opt_state=opt.init(params),
        noise_key=k_noise,
        rng=k_rng,
        step=jnp.zeros((), jnp.int32),
    )


# Jitted key helpers. Eager `fold_in`/`split` decompose into dozens of
# individually-dispatched primitives; on a remote-dispatch backend (axon
# tunnel) that costs 100-500 ms per call vs ~0.1 ms for the single compiled
# program — measured 558 ms/iteration in the round-2 training loop before
# this change. Always route per-iteration key math through these.
_fold1 = jax.jit(lambda k: jax.random.fold_in(k, 1))
split2 = jax.jit(lambda k: tuple(jax.random.split(k)))


def reset_noise(state: AgentState) -> AgentState:
    """Draw a new set of noisy weights (reference agent.py:49-50) by
    advancing the noise key."""
    return state.replace(noise_key=_fold1(state.noise_key))


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"))
def act(params: dict, cfg: RainbowConfig, action_space: int,
        states: jax.Array, noise_key: Optional[jax.Array]) -> jax.Array:
    """Greedy batched action selection: argmax_a Σ_z z·p (reference
    agent.py:53-55), for all envs in one forward (vs the reference's
    batch-1 per-step forward). With cfg.per_env_noise each env row gets an
    independent noise draw (decorrelated batched exploration — the reference
    has one env, so shared noise is its exact semantics)."""
    support = support_vector(cfg.v_min, cfg.v_max, cfg.atoms)
    probs = apply_dqn(params, cfg, action_space, states, noise_key,
                      per_sample_noise=getattr(cfg, "per_env_noise", False))
    return jnp.argmax((probs * support).sum(axis=2), axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"))
def act_e_greedy(params: dict, cfg: RainbowConfig, action_space: int,
                 states: jax.Array, key: jax.Array,
                 epsilon: float = 0.001) -> jax.Array:
    """ε-greedy evaluation policy (reference agent.py:58-59); the net runs in
    eval mode (μ only — noise_key=None)."""
    k_eps, k_act = jax.random.split(key)
    greedy = act(params, cfg, action_space, states, None)
    rand = jax.random.randint(k_act, greedy.shape, 0, action_space)
    explore = jax.random.uniform(k_eps, greedy.shape) < epsilon
    return jnp.where(explore, rand, greedy)


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"))
def evaluate_q(params: dict, cfg: RainbowConfig, action_space: int,
               states: jax.Array) -> jax.Array:
    """Max expected Q per state (reference agent.py:110-112), batched."""
    support = support_vector(cfg.v_min, cfg.v_max, cfg.atoms)
    return q_values(params, cfg, action_space, support, states, None).max(axis=1)


def _loss_fn(params, cfg, action_space, support, batch, online_noise_key,
             noise_eps=None):
    log_ps = apply_dqn(params, cfg, action_space, batch["states"],
                       online_noise_key, log=True, noise_eps=noise_eps)
    log_ps_a = jnp.take_along_axis(
        log_ps, batch["actions"][:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]  # (B, atoms) — reference agent.py:66-67
    losses = c51_loss(log_ps_a, batch["target_m"])
    return (batch["weights"] * losses).mean(), losses


def compute_update(agent: AgentState, cfg: RainbowConfig, action_space: int,
                   batch: dict) -> Tuple[dict, jax.Array, jax.Array]:
    """Target construction + gradient for one batch. Returns
    (grads, per-sample losses, new rng). Split out from ``learn_step`` so the
    distributed learner can psum grads across the mesh (parallel/learner.py).

    Measured-and-rejected (round 4): folding the double-Q SELECTION forward
    into the gradient forward as one concatenated batch-2B pass (legal —
    the reference shares one noise sample across both online forwards,
    agent.py:66-73) made the marginal update COST 7% more on the v5e
    (0.704 vs 0.658 ms/update, 256-update batched-PER rounds): the saved
    batch-B forward kernels are cheaper than the extra batch-2B backward
    conv/wgrad work, since the selection half still participates in the
    whole backward chain even with zero cotangent. Two-forward form kept.
    """
    support = support_vector(cfg.v_min, cfg.v_max, cfg.atoms)
    rng, k_target = jax.random.split(agent.rng)

    # --- target distribution, no grad (reference agent.py:69-92) ---
    next_states = batch["next_states"]
    # Double-Q action selection with ONLINE params + current online noise.
    pns_online = apply_dqn(agent.params, cfg, action_space, next_states,
                           agent.noise_key)
    a_star = jnp.argmax((pns_online * support).sum(axis=2), axis=1)
    # Target net with freshly drawn noise (reference agent.py:74).
    pns_target = apply_dqn(agent.target_params, cfg, action_space,
                           next_states, k_target)
    pns_a = jnp.take_along_axis(
        pns_target, a_star[:, None, None], axis=1)[:, 0, :]
    target_m = project_distribution(
        pns_a, batch["returns"], batch["nonterminals"],
        cfg.discount ** cfg.multi_step, support, cfg.v_min, cfg.v_max)
    target_m = jax.lax.stop_gradient(target_m)

    full_batch = dict(batch, target_m=target_m)
    grads, losses = jax.grad(_loss_fn, has_aux=True)(
        agent.params, cfg, action_space, support, full_batch, agent.noise_key)
    return grads, losses, rng


def compute_update_pretarget(agent: AgentState, cfg: RainbowConfig,
                             action_space: int, batch: dict,
                             pns_target: jax.Array,
                             noise_eps: Optional[dict] = None
                             ) -> Tuple[dict, jax.Array, jax.Array]:
    """compute_update with the TARGET-net forward hoisted out: ``pns_target``
    is this batch's slice of a round-wide target forward (target params are
    frozen within a learner round — sync happens between rounds — so one
    dense (round·batch)-row forward replaces a scanned per-update forward;
    see train._learner_round_batched_impl). Double-Q action selection still
    uses the CURRENT online params per update (reference agent.py:71-73).
    ``noise_eps`` (models.dqn.draw_noise) supplies this update's pre-drawn
    online-net noise, shared by the selection forward and the grad forward
    exactly as the key-based path shares agent.noise_key."""
    support = support_vector(cfg.v_min, cfg.v_max, cfg.atoms)
    rng, _ = jax.random.split(agent.rng)  # keep the rng stream cadence

    next_states = batch["next_states"]
    pns_online = apply_dqn(agent.params, cfg, action_space, next_states,
                           agent.noise_key, noise_eps=noise_eps)
    a_star = jnp.argmax((pns_online * support).sum(axis=2), axis=1)
    pns_a = jnp.take_along_axis(
        pns_target, a_star[:, None, None], axis=1)[:, 0, :]
    target_m = project_distribution(
        pns_a, batch["returns"], batch["nonterminals"],
        cfg.discount ** cfg.multi_step, support, cfg.v_min, cfg.v_max)
    target_m = jax.lax.stop_gradient(target_m)

    full_batch = dict(batch, target_m=target_m)
    grads, losses = jax.grad(_loss_fn, has_aux=True)(
        agent.params, cfg, action_space, support, full_batch,
        agent.noise_key, noise_eps)
    return grads, losses, rng


def apply_grads(agent: AgentState, cfg: RainbowConfig, grads: dict,
                rng: jax.Array) -> AgentState:
    opt = make_optimizer(cfg)
    updates, new_opt_state = opt.update(grads, agent.opt_state, agent.params)
    return agent.replace(
        params=optax.apply_updates(agent.params, updates),
        opt_state=new_opt_state,
        rng=rng,
        step=agent.step + 1,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "action_space"),
                   donate_argnames=("agent", "rep"))
def learn_step(agent: AgentState, rep: replay.ReplayState,
               cfg: RainbowConfig, action_space: int, beta: jax.Array,
               sample_key: jax.Array
               ) -> Tuple[AgentState, replay.ReplayState, jax.Array]:
    """One fused learner iteration: prioritized sample → C51 double-Q update
    → Adam → priority write-back (the whole of reference agent.py:61-100 plus
    memory.sample/update_priorities as a single XLA program)."""
    batch = replay.sample(rep, sample_key, beta,
                          batch_size=cfg.batch_size,
                          history=cfg.history_length,
                          n_step=cfg.multi_step,
                          discount=cfg.discount)
    grads, losses, rng = compute_update(agent, cfg, action_space, batch)
    agent = apply_grads(agent, cfg, grads, rng)
    # Raw per-sample CE loss becomes the new priority (reference agent.py:100);
    # ^ω is applied inside update_priorities (memory.py:157-159).
    rep = replay.update_priorities(rep, batch["idxs"],
                                   jax.lax.stop_gradient(losses),
                                   cfg.priority_exponent)
    return agent, rep, losses.mean()


def adapt_opt_state(agent: AgentState, cfg: RainbowConfig) -> AgentState:
    """Make a restored optimizer state compatible with the current
    optimizer structure. Pre-flatten checkpoints stored per-leaf Adam
    moments; the flattened optimizer stores them as one ravelled vector —
    convert (ravel in the same order, preserving the exact moments) when
    possible, else re-initialise with a warning (losing only the Adam
    moments, not params/replay/T)."""
    opt = make_optimizer(cfg)
    fresh = opt.init(agent.params)
    def shape_tree(t):
        return jax.tree_util.tree_structure(t)
    if shape_tree(agent.opt_state) == shape_tree(fresh):
        return agent
    try:
        from jax.flatten_util import ravel_pytree

        flat_template, unravel = ravel_pytree(agent.params)

        def find_mu(node):
            if hasattr(node, "mu"):
                return node.mu
            if isinstance(node, tuple):
                for x in node:
                    got = find_mu(x)
                    if got is not None:
                        return got
            return None

        def is_flat(moments):
            return (isinstance(moments, jax.Array)
                    and getattr(moments, "ndim", None) == 1)

        want_flat = is_flat(find_mu(fresh))

        def to_match(moments):
            """Convert stored Adam moments to the current optimizer layout:
            per-leaf -> ravelled (flattened optimizer) or ravelled ->
            per-leaf (plain chain), preserving the exact values. Unravel
            follows the params tree structure; the moment dtype (e.g. bf16
            mu) is preserved per leaf."""
            if want_flat and not is_flat(moments):
                return ravel_pytree(moments)[0]
            if not want_flat and is_flat(moments):
                dtype = moments.dtype
                tree = unravel(jnp.asarray(moments, flat_template.dtype))
                return jax.tree.map(lambda x: x.astype(dtype), tree)
            return moments

        def convert(node):
            if hasattr(node, "mu") and hasattr(node, "nu"):
                return node._replace(mu=to_match(node.mu),
                                     nu=to_match(node.nu))
            if hasattr(node, "_fields"):  # other namedtuple states
                return type(node)(*(convert(x) for x in node))
            if isinstance(node, tuple):
                return tuple(convert(x) for x in node)
            return node

        new_state = convert(agent.opt_state)
        if shape_tree(new_state) != shape_tree(fresh):
            raise ValueError("structure still differs after conversion")
        return agent.replace(opt_state=new_state)
    except Exception as e:
        from rainbow_tpu.utils.logging import log
        log(f"optimizer state incompatible with checkpoint ({e!r}); "
            f"re-initialising Adam moments")
        return agent.replace(opt_state=fresh)


_copy_tree = jax.jit(lambda p: jax.tree.map(jnp.copy, p))


def update_target(agent: AgentState) -> AgentState:
    """Hard target sync (reference agent.py:102-103). One compiled dispatch
    rather than an eager per-leaf copy chain (see the key-helper note above)."""
    return agent.replace(target_params=_copy_tree(agent.params))
