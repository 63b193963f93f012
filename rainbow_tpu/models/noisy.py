"""Factorised-Gaussian NoisyLinear as pure functions over explicit params.

Semantics match the reference layer (reference model.py:10-46) — NoisyNets
(Fortunato et al. 2017) with factorised noise f(x) = sign(x)·sqrt(|x|) — but
the design is TPU-native:

* No noise buffers. The reference stores ε in registered buffers and mutates
  them in-place on ``reset_noise`` (reference model.py:36-40). Here noise is a
  *deterministic function of a PRNG key*, regenerated inside jit on every
  forward; "resetting noise" is simply advancing the key. This keeps the
  whole step functional (no donated mutable state) and costs nothing: the two
  1-D normal draws fuse into the matmul epilogue under XLA.
* The (out, in) noise outer-product is never materialised. With
  ε_w = ε_out ⊗ ε_in, the noisy matmul factorises as

      y = x @ μ_wᵀ + ((x · ε_in) @ σ_wᵀ) · ε_out + μ_b + σ_b · ε_out

  i.e. two MXU matmuls and VPU elementwise ops, instead of building a dense
  perturbed weight matrix per forward (reference model.py:44 builds
  μ + σ·ε explicitly).

Initialisation matches reference model.py:25-30: μ ~ U(±1/√in),
σ_w = σ₀/√in, σ_b = σ₀/√out.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def init_noisy_params(key: jax.Array, in_features: int, out_features: int,
                      std_init: float, dtype=jnp.float32) -> dict:
    k_w, k_b = jax.random.split(key)
    mu_range = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    return {
        "w_mu": jax.random.uniform(k_w, (out_features, in_features), dtype,
                                   -mu_range, mu_range),
        "w_sigma": jnp.full((out_features, in_features),
                            std_init / in_features ** 0.5, dtype),
        "b_mu": jax.random.uniform(k_b, (out_features,), dtype,
                                   -mu_range, mu_range),
        "b_sigma": jnp.full((out_features,), std_init / out_features ** 0.5,
                            dtype),
    }


def _scale_noise(key: jax.Array, shape, dtype) -> jax.Array:
    """f(x) = sign(x)·sqrt(|x|) over a standard normal draw (reference model.py:32-34)."""
    if isinstance(shape, int):
        shape = (shape,)
    x = jax.random.normal(key, shape, dtype)
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def noisy_linear(params: dict, x: jax.Array,
                 noise_key: Optional[jax.Array],
                 per_sample: bool = False,
                 eps: Optional[tuple] = None) -> jax.Array:
    """Apply a noisy linear layer.

    noise_key=None gives the eval path (μ only, reference model.py:45-46);
    otherwise factored noise is drawn from the key (training path,
    reference model.py:42-44).

    per_sample=True draws an INDEPENDENT factored-noise sample per batch row
    (ε_in, ε_out become (B, in)/(B, out)) — decorrelated exploration across a
    batched actor's envs. The reference has one env, so its single shared
    noise sample is the per_sample=False case; at hundreds of envs a shared
    sample makes every env explore identically (see docs/results_r1).
    The factored form keeps this free of any per-sample weight matrices:
    the σ matmul stays a single shared MXU op, with the batch noise applied
    as elementwise scalings of its input and output.

    eps=(eps_in, eps_out) supplies PRE-DRAWN scaled noise (already through
    f(x)), bypassing key-based generation — scanned learner rounds hoist all
    updates' noise draws into one batched pass (train.py).
    """
    dtype = x.dtype
    y = x @ params["w_mu"].astype(dtype).T + params["b_mu"].astype(dtype)
    if noise_key is None and eps is None:
        return y
    if eps is not None:
        eps_in, eps_out = (e.astype(dtype) for e in eps)
    else:
        in_features = params["w_mu"].shape[1]
        out_features = params["w_mu"].shape[0]
        k_in, k_out = jax.random.split(noise_key)
        lead = (x.shape[0],) if per_sample else ()
        eps_in = _scale_noise(k_in, lead + (in_features,), dtype)
        eps_out = _scale_noise(k_out, lead + (out_features,), dtype)
    noise = ((x * eps_in) @ params["w_sigma"].astype(dtype).T) * eps_out
    return y + noise + params["b_sigma"].astype(dtype) * eps_out
