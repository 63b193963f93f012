import jax
import jax.numpy as jnp
import numpy as np

from rainbow_tpu.models.noisy import (_scale_noise, init_noisy_params,
                                      noisy_linear)


def test_eval_mode_is_mu_linear():
    key = jax.random.key(0)
    p = init_noisy_params(key, 16, 8, std_init=0.5)
    x = jax.random.normal(jax.random.key(1), (4, 16))
    y = noisy_linear(p, x, None)
    expected = x @ p["w_mu"].T + p["b_mu"]
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_train_mode_matches_explicit_outer_product():
    """The factored matmul form must equal materialising
    w = μ + σ·(ε_out ⊗ ε_in) explicitly (reference model.py:42-44)."""
    key = jax.random.key(0)
    p = init_noisy_params(key, 16, 8, std_init=0.5)
    x = jax.random.normal(jax.random.key(1), (4, 16))
    nk = jax.random.key(2)
    y = noisy_linear(p, x, nk)

    k_in, k_out = jax.random.split(nk)
    eps_in = _scale_noise(k_in, 16, jnp.float32)
    eps_out = _scale_noise(k_out, 8, jnp.float32)
    w = p["w_mu"] + p["w_sigma"] * jnp.outer(eps_out, eps_in)
    b = p["b_mu"] + p["b_sigma"] * eps_out
    np.testing.assert_allclose(y, x @ w.T + b, rtol=1e-5, atol=1e-5)


def test_init_statistics():
    """μ ~ U(±1/√in), σ_w = σ₀/√in, σ_b = σ₀/√out (reference model.py:25-30)."""
    p = init_noisy_params(jax.random.key(3), 100, 50, std_init=0.4)
    bound = 1 / np.sqrt(100)
    assert np.abs(p["w_mu"]).max() <= bound
    np.testing.assert_allclose(p["w_sigma"], 0.4 / np.sqrt(100))
    np.testing.assert_allclose(p["b_sigma"], 0.4 / np.sqrt(50))


def test_noise_deterministic_per_key():
    p = init_noisy_params(jax.random.key(0), 16, 8, std_init=0.5)
    x = jax.random.normal(jax.random.key(1), (4, 16))
    y1 = noisy_linear(p, x, jax.random.key(7))
    y2 = noisy_linear(p, x, jax.random.key(7))
    y3 = noisy_linear(p, x, jax.random.key(8))
    np.testing.assert_array_equal(y1, y2)
    assert not np.allclose(y1, y3)


def test_scale_noise_distribution():
    """f(x)=sign(x)√|x| keeps sign, sqrt-compresses magnitude."""
    e = _scale_noise(jax.random.key(0), 10000, jnp.float32)
    assert abs(float(jnp.mean(e))) < 0.05
    # E[|f(x)|] = E[sqrt(|x|)] ≈ 0.822 for standard normal
    assert 0.75 < float(jnp.mean(jnp.abs(e))) < 0.90
