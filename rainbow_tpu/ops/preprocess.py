"""Device-side observation preprocessing: frame-stack maintenance in XLA.

The reference maintains a host-side deque of float frames (reference
env.py:23-24, 52, 77) and re-buffers on reset (env.py:41). Here the stack for
all N envs is one uint8 (N, 84, 84, H) device array updated inside jit, with
the engine's reset_kind codes reproducing the reference's three buffer
behaviours exactly:

  kind 0 — normal step: roll, append the step observation (env.py:68).
  kind 1 — life-loss continuation: the terminal observation was rolled in by
           the step AND the post-no-op frame follows it (env.py:36-38 appends
           the no-op frame to the *kept* buffer, which already holds the
           terminal obs from env.py:68).
  kind 2 — full reset: zeroed buffer with only the reset frame (env.py:41-52).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_framestack(num_envs: int, history: int, first_frames: jax.Array
                    ) -> jax.Array:
    """Zeroed stack with the initial reset frame in the newest slot."""
    f = first_frames.shape[-1]
    stack = jnp.zeros((num_envs, f, f, history), jnp.uint8)
    return stack.at[..., -1].set(first_frames)


def update_framestack(stack: jax.Array, obs: jax.Array,
                      reset_frames: jax.Array, kinds: jax.Array) -> jax.Array:
    """Advance the (N, 84, 84, H) uint8 stack by one step per reset_kind."""
    rolled = jnp.concatenate([stack[..., 1:], obs[..., None]], axis=-1)
    life = jnp.concatenate(
        [stack[..., 2:], obs[..., None], reset_frames[..., None]], axis=-1)
    fresh = jnp.concatenate(
        [jnp.zeros_like(stack[..., :-1]), reset_frames[..., None]], axis=-1)
    k = kinds[:, None, None, None]
    return jnp.where(k == 0, rolled, jnp.where(k == 1, life, fresh))


def to_network_input(stack_u8: jax.Array) -> jax.Array:
    """uint8 stack → float32 [0,1] NHWC network input (reference env.py:29)."""
    return stack_u8.astype(jnp.float32) / 255.0
