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


def test_per_sample_noise_decorrelates_rows():
    """per_sample=True: identical input rows get DIFFERENT noise draws;
    per_sample=False: one shared draw, so identical rows stay identical."""
    p = init_noisy_params(jax.random.key(2), 16, 8, std_init=0.5)
    x = jnp.tile(jax.random.normal(jax.random.key(3), (1, 16)), (6, 1))
    nk = jax.random.key(4)
    shared = noisy_linear(p, x, nk)
    per = noisy_linear(p, x, nk, per_sample=True)
    # Shared: all rows equal.
    np.testing.assert_allclose(shared, jnp.tile(shared[:1], (6, 1)),
                               rtol=1e-6)
    # Per-sample: rows pairwise distinct.
    for i in range(5):
        assert not np.allclose(per[i], per[i + 1]), f"rows {i},{i+1} equal"
    # Expectation preserved: per-sample noise has the same mu backbone.
    mu = x @ p["w_mu"].T + p["b_mu"]
    assert np.isfinite(np.asarray(per)).all()
    assert np.abs(np.asarray(per - mu)).max() < 10.0  # bounded perturbation


def test_per_env_noise_act_path():
    """cfg.per_env_noise=True: identical env states can choose different
    actions under noise; False: identical states always agree."""
    from rainbow_tpu import agent as ag
    from rainbow_tpu import config as cfg_mod
    from rainbow_tpu.models.dqn import apply_dqn

    cfg = cfg_mod.data_efficient(num_envs=8, hidden_size=64)
    A = 6
    params = ag.init_agent(jax.random.key(0), cfg, A).params
    x = jnp.tile(jax.random.uniform(jax.random.key(1), (1, 84, 84, 4)),
                 (8, 1, 1, 1))
    nk = jax.random.key(5)
    probs_shared = apply_dqn(params, cfg, A, x, nk)
    probs_per = apply_dqn(params, cfg, A, x, nk, per_sample_noise=True)
    np.testing.assert_allclose(probs_shared,
                               jnp.tile(probs_shared[:1], (8, 1, 1)),
                               rtol=1e-5, atol=1e-7)
    row_dev = np.abs(np.asarray(probs_per - probs_per[:1])).max(axis=(1, 2))
    assert (row_dev[1:] > 1e-6).all(), "per-env noise did not decorrelate"
