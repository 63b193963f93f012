"""Network-level tests: shapes, normalisation, dtypes, torso variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rainbow_tpu
from rainbow_tpu.models.dqn import apply_dqn, init_dqn_params, q_values
from rainbow_tpu.ops.c51 import support_vector


@pytest.mark.parametrize("arch,flat", [("canonical", 3136),
                                       ("data-efficient", 576)])
def test_torso_flat_sizes(arch, flat):
    """Conv output sizes must match reference model.py:58/63."""
    cfg = rainbow_tpu.canonical(architecture=arch, hidden_size=32)
    assert cfg.conv_output_size == flat
    params = init_dqn_params(jax.random.key(0), cfg, 4)
    x = jnp.zeros((2, 84, 84, 4))
    p = apply_dqn(params, cfg, 4, x, None)
    assert p.shape == (2, 4, cfg.atoms)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)


def test_log_and_prob_paths_consistent():
    cfg = rainbow_tpu.data_efficient(hidden_size=32)
    params = init_dqn_params(jax.random.key(1), cfg, 6)
    x = jax.random.uniform(jax.random.key(2), (3, 84, 84, 4))
    nk = jax.random.key(3)
    p = apply_dqn(params, cfg, 6, x, nk)
    logp = apply_dqn(params, cfg, 6, x, nk, log=True)
    np.testing.assert_allclose(np.asarray(jnp.exp(logp)), np.asarray(p),
                               rtol=1e-5, atol=1e-6)


def test_bfloat16_compute_path():
    """bf16 compute with f32 params/softmax must run and stay normalised,
    close to the f32 result."""
    cfg32 = rainbow_tpu.data_efficient(hidden_size=32)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    params = init_dqn_params(jax.random.key(4), cfg32, 4)
    x = jax.random.uniform(jax.random.key(5), (4, 84, 84, 4))
    p32 = apply_dqn(params, cfg32, 4, x, None)
    p16 = apply_dqn(params, cfg16, 4, x, None)
    assert p16.dtype == jnp.float32  # softmax output stays f32
    np.testing.assert_allclose(np.asarray(p16).sum(-1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.05)


def test_q_values_expected_value():
    cfg = rainbow_tpu.data_efficient(hidden_size=32)
    params = init_dqn_params(jax.random.key(6), cfg, 3)
    support = support_vector(cfg.v_min, cfg.v_max, cfg.atoms)
    x = jax.random.uniform(jax.random.key(7), (2, 84, 84, 4))
    q = q_values(params, cfg, 3, support, x, None)
    p = apply_dqn(params, cfg, 3, x, None)
    np.testing.assert_allclose(np.asarray(q),
                               np.asarray((p * support).sum(-1)), rtol=1e-5)
    assert (np.abs(np.asarray(q)) <= 10.0 + 1e-5).all()  # within support
