import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rainbow_tpu.ops.c51 import (c51_loss, project_distribution,
                                 support_vector)


def scatter_projection_reference(next_probs, returns, nonterminals,
                                 discount_n, v_min, v_max, atoms):
    """Independent numpy re-derivation of the categorical projection using
    the scatter/l-u formulation with the l==u fixups (the algorithm of
    reference agent.py:79-92, re-implemented from the C51 paper)."""
    z = np.linspace(v_min, v_max, atoms)
    dz = (v_max - v_min) / (atoms - 1)
    B = next_probs.shape[0]
    m = np.zeros((B, atoms))
    for s in range(B):
        for i in range(atoms):
            tz = returns[s] + nonterminals[s] * discount_n * z[i]
            tz = min(max(tz, v_min), v_max)
            b = (tz - v_min) / dz
            l, u = int(np.floor(b)), int(np.ceil(b))
            if l == u:  # integer b: mass would vanish without a fixup
                if u > 0:
                    l -= 1
                elif l < atoms - 1:
                    u += 1
            m[s, l] += next_probs[s, i] * (u - b)
            m[s, u] += next_probs[s, i] * (b - l)
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_projection_matches_scatter_reference(seed):
    rng = np.random.default_rng(seed)
    B, atoms = 16, 51
    p = rng.random((B, atoms))
    p /= p.sum(1, keepdims=True)
    returns = rng.uniform(-12, 12, B)
    nonterm = (rng.random(B) > 0.3).astype(np.float64)
    support = support_vector(-10.0, 10.0, atoms)
    got = project_distribution(jnp.asarray(p, jnp.float32),
                               jnp.asarray(returns, jnp.float32),
                               jnp.asarray(nonterm, jnp.float32),
                               0.99 ** 3, support, -10.0, 10.0)
    want = scatter_projection_reference(p, returns, nonterm, 0.99 ** 3,
                                        -10.0, 10.0, atoms)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_projection_integer_b_edge_cases():
    """b landing exactly on atoms (incl. endpoints 0 and atoms-1) must keep
    all mass — the cases the reference's l==u fixups exist for."""
    atoms = 51
    support = support_vector(-10.0, 10.0, atoms)
    p = np.zeros((3, atoms), np.float32)
    p[:, 25] = 1.0  # all mass at z=0
    # terminal with return exactly at V_min, 0, and V_max
    returns = jnp.asarray([-10.0, 0.0, 10.0], jnp.float32)
    nonterm = jnp.zeros(3, jnp.float32)
    m = project_distribution(jnp.asarray(p), returns, nonterm, 0.99,
                             support, -10.0, 10.0)
    np.testing.assert_allclose(m.sum(1), 1.0, rtol=1e-5)
    assert float(m[0, 0]) == pytest.approx(1.0, abs=1e-6)
    assert float(m[1, 25]) == pytest.approx(1.0, abs=1e-6)
    assert float(m[2, atoms - 1]) == pytest.approx(1.0, abs=1e-6)


def test_projection_conserves_mass():
    rng = np.random.default_rng(42)
    B, atoms = 32, 51
    p = rng.random((B, atoms)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    support = support_vector(-10.0, 10.0, atoms)
    m = project_distribution(jnp.asarray(p),
                             jnp.asarray(rng.uniform(-30, 30, B), jnp.float32),
                             jnp.asarray(rng.integers(0, 2, B), jnp.float32),
                             0.99 ** 20, support, -10.0, 10.0)
    np.testing.assert_allclose(np.asarray(m).sum(1), 1.0, rtol=1e-4)


def test_c51_loss():
    m = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
    log_p = jnp.log(jnp.asarray([[0.25, 0.75], [0.9, 0.1]]))
    losses = c51_loss(log_p, m)
    want = [-(0.5 * np.log(0.25) + 0.5 * np.log(0.75)), -np.log(0.9)]
    np.testing.assert_allclose(losses, want, rtol=1e-4)
