"""C51 distributional ops: support projection and the Rainbow learn update.

The reference implements the categorical projection with a flattened
``index_add_`` scatter plus two edge-case fixups for integer-valued b
(reference agent.py:79-92). Scatters map poorly onto the TPU; here the
projection is a *dense triangular-kernel batched matmul*:

    m_j = Σ_i p_i · max(0, 1 − |b_i − j|)

which is algebraically identical to the reference's l/u bilinear scatter —
including its l==u fixups (agent.py:85-86), whose only purpose is to keep
mass from vanishing when b lands exactly on an atom; the triangular kernel
assigns that mass to atom b directly. The (B, atoms, atoms) weight tensor is
51×51 per sample and the contraction runs on the MXU. Verified equivalent in
tests/test_c51.py against an independent scatter-based numpy implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def support_vector(v_min: float, v_max: float, atoms: int) -> jax.Array:
    """z = linspace(V_min, V_max, atoms) — reference agent.py:18."""
    return jnp.linspace(v_min, v_max, atoms, dtype=jnp.float32)


def project_distribution(next_probs: jax.Array, returns: jax.Array,
                         nonterminals: jax.Array, discount_n: float,
                         support: jax.Array, v_min: float,
                         v_max: float) -> jax.Array:
    """Project the Bellman-updated distribution onto the fixed support.

    Args:
      next_probs: (B, atoms) target-net probabilities at the argmax action.
      returns: (B,) n-step returns R^n.
      nonterminals: (B,) float 1/0 mask for the (t+n)th state.
      discount_n: γ^n (python float, static).
      support: (atoms,) atom values z.
    Returns (B, atoms) projected target distribution m.

    Mirrors reference agent.py:79-92: Tz = Rⁿ + γⁿ·z·nonterminal, clamped to
    [V_min, V_max], then L2-projected.
    """
    atoms = support.shape[0]
    delta_z = (v_max - v_min) / (atoms - 1)
    tz = returns[:, None] + nonterminals[:, None] * discount_n * support[None, :]
    tz = jnp.clip(tz, v_min, v_max)
    b = (tz - v_min) / delta_z  # (B, atoms) fractional atom positions
    atom_idx = jnp.arange(atoms, dtype=b.dtype)
    # (B, atoms_src, atoms_tgt) triangular interpolation weights.
    w = jnp.clip(1.0 - jnp.abs(b[:, :, None] - atom_idx[None, None, :]), 0.0, 1.0)
    return jnp.einsum("bi,bij->bj", next_probs, w,
                      preferred_element_type=jnp.float32)


def c51_loss(log_probs_a: jax.Array, target_m: jax.Array) -> jax.Array:
    """Per-sample cross-entropy −Σ_j m_j · log p_j — reference agent.py:94."""
    return -(target_m * log_probs_a).sum(axis=1)
