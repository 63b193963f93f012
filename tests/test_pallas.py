"""Pallas kernel equivalence tests (interpret mode on CPU; the same kernel
compiles for TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rainbow_tpu
from rainbow_tpu.models.dqn import _torso, apply_dqn, init_dqn_params
from rainbow_tpu.ops.pallas_kernels import fused_dueling_head


@pytest.mark.parametrize("log", [False, True])
@pytest.mark.parametrize("noisy", [False, True])
def test_fused_head_matches_reference_path(log, noisy):
    cfg = rainbow_tpu.data_efficient(hidden_size=64)
    A = 6
    params = init_dqn_params(jax.random.key(0), cfg, A)
    x = jax.random.uniform(jax.random.key(1), (8, 84, 84, 4))
    noise_key = jax.random.key(2) if noisy else None

    want = apply_dqn(params, cfg, A, x, noise_key, log=log)
    feat = _torso(params, cfg, x)
    got = fused_dueling_head(feat, params, noise_key, atoms=cfg.atoms,
                             action_space=A, hidden=cfg.hidden_size,
                             log=log, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_head_probabilities_normalised():
    cfg = rainbow_tpu.data_efficient(hidden_size=32)
    A = 4
    params = init_dqn_params(jax.random.key(3), cfg, A)
    feat = jax.random.normal(jax.random.key(4), (16, cfg.conv_output_size))
    p = fused_dueling_head(feat, params, jax.random.key(5), atoms=cfg.atoms,
                           action_space=A, hidden=cfg.hidden_size,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)


def test_fused_head_vjp_matches_xla_gradients():
    """The fused head's custom VJP must produce the same gradients as the
    plain XLA head (same params, same key-derived noise), so
    cfg.use_pallas_head is safe on the LEARN path too."""
    import functools

    import rainbow_tpu
    from rainbow_tpu.models.dqn import apply_dqn, init_dqn_params

    cfg = rainbow_tpu.canonical(hidden_size=64, use_pallas_head=False)
    A = 4
    key = jax.random.key(0)
    params = init_dqn_params(key, cfg, A)
    x = jax.random.uniform(jax.random.key(1), (8, 84, 84, 4))
    nk = jax.random.key(2)

    def loss(params, use_pallas):
        lp = apply_dqn(params, cfg, A, x, nk, log=True,
                       use_pallas=use_pallas)
        return (lp[:, 0, :] * jnp.arange(cfg.atoms)).sum()

    # interpret mode on CPU: route through the kernel's custom-vjp wrapper.
    import rainbow_tpu.models.dqn as dqn_mod
    g_ref = jax.grad(functools.partial(loss, use_pallas=False))(params)
    g_pal = jax.grad(functools.partial(loss, use_pallas=True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
