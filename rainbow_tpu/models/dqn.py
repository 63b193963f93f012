"""C51 dueling DQN with noisy heads — pure-functional JAX, NHWC/TPU layout.

Capability parity with the reference network (reference model.py:49-85):
both torsos — 'canonical' 32c8s4→64c4s2→64c3s1 (flat 3136) and
'data-efficient' 32c5s5→64c5s5 (flat 576), valid padding, ReLU
(reference model.py:55-63); dueling value/advantage streams, each a 2-layer
NoisyLinear MLP (reference model.py:64-67, 72-73); per-atom combine
q = v + a − mean_a(a) (reference model.py:74-75); (log-)softmax over the atom
axis (reference model.py:76-79).

TPU-native departures:
* NHWC activations + HWIO kernels (XLA's preferred TPU conv layout) instead of
  torch NCHW.
* Noise comes from PRNG keys threaded through ``apply`` (see models/noisy.py):
  one key per noisy layer, split from a single layer key; ``noise_key=None``
  is eval mode (μ only).
* Optional bfloat16 compute with float32 params and a float32 softmax.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rainbow_tpu.models.noisy import init_noisy_params, noisy_linear

# (out_channels, kernel, stride) per torso — reference model.py:55-63.
ARCHS = {
    "canonical": ((32, 8, 4), (64, 4, 2), (64, 3, 1)),
    "data-efficient": ((32, 5, 5), (64, 5, 5)),
}


def _conv_init(key, kh, kw, cin, cout, dtype):
    # U(±1/√fan_in) for weight and bias — same regime as torch's default
    # Conv2d init that the reference relies on implicitly.
    fan_in = kh * kw * cin
    bound = 1.0 / fan_in ** 0.5
    k_w, k_b = jax.random.split(key)
    w = jax.random.uniform(k_w, (kh, kw, cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_dqn_params(key: jax.Array, cfg, action_space: int,
                    dtype=jnp.float32) -> dict:
    """Initialise all network params as a nested dict pytree."""
    arch = ARCHS[cfg.architecture]
    keys = jax.random.split(key, len(arch) + 4)
    convs = []
    cin = cfg.history_length
    for i, (cout, k, _s) in enumerate(arch):
        convs.append(_conv_init(keys[i], k, k, cin, cout, dtype))
        cin = cout
    flat = cfg.conv_output_size
    h = cfg.hidden_size
    # Four noisy layers — reference model.py:64-67.
    return {
        "convs": convs,
        "fc_h_v": init_noisy_params(keys[-4], flat, h, cfg.noisy_std, dtype),
        "fc_h_a": init_noisy_params(keys[-3], flat, h, cfg.noisy_std, dtype),
        "fc_z_v": init_noisy_params(keys[-2], h, cfg.atoms, cfg.noisy_std, dtype),
        "fc_z_a": init_noisy_params(keys[-1], h, action_space * cfg.atoms,
                                    cfg.noisy_std, dtype),
    }


def _torso(params, cfg, x: jax.Array) -> jax.Array:
    """Conv stack over NHWC input (B, 84, 84, history) → (B, flat)."""
    arch = ARCHS[cfg.architecture]
    for p, (_c, _k, stride) in zip(params["convs"], arch):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + p["b"].astype(x.dtype))
    # Flatten in NCHW order (transpose first) so the flat feature indexing is
    # layout-independent: (B, H', W', C) -> (B, C, H', W') -> (B, C*H'*W').
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(x.shape[0], -1)


NOISY_LAYERS = ("fc_h_v", "fc_h_a", "fc_z_v", "fc_z_a")


def draw_noise(cfg, action_space: int, key: jax.Array, lead=()) -> dict:
    """Pre-draw factored noise for every noisy layer, with an optional
    leading shape (e.g. (num_updates,) for a whole scanned learner round in
    one batched pass — see train._learner_round_batched_impl). Returns
    {layer: (eps_in, eps_out)} consumable via apply_dqn(noise_eps=...)."""
    from rainbow_tpu.models.noisy import _scale_noise

    flat, h = cfg.conv_output_size, cfg.hidden_size
    dims = {"fc_h_v": (flat, h), "fc_h_a": (flat, h),
            "fc_z_v": (h, cfg.atoms), "fc_z_a": (h, action_space * cfg.atoms)}
    keys = jax.random.split(key, 4)
    out = {}
    for k, name in zip(keys, NOISY_LAYERS):
        k_in, k_out = jax.random.split(k)
        din, dout = dims[name]
        out[name] = (_scale_noise(k_in, tuple(lead) + (din,), jnp.float32),
                     _scale_noise(k_out, tuple(lead) + (dout,), jnp.float32))
    return out


def apply_dqn(params: dict, cfg, action_space: int, x: jax.Array,
              noise_key: Optional[jax.Array] = None,
              log: bool = False,
              per_sample_noise: bool = False,
              noise_eps: Optional[dict] = None) -> jax.Array:
    """Forward pass: (B, 84, 84, history) NHWC float → (B, A, atoms).

    Returns atom probabilities (softmax) or log-probabilities (log=True, the
    loss path) — reference model.py:69-80. ``noise_key`` drives all four
    noisy layers (split 4-ways); None = eval/μ-only mode.
    per_sample_noise: independent noise per batch row (see models/noisy.py).

    The head runs as plain XLA deliberately. A monolithic fused Pallas head
    (noisy matmuls + dueling combine + atom softmax in one VMEM-resident
    kernel, with a custom VJP) was built and measured on the v5e in round 3:
    the canonical head's fp32 weights alone are 25.6 MB — over the 16 MB
    scoped-VMEM budget — so it cannot compile at act-path batches (≥256),
    and at B≤128 where it fits it measured parity with XLA's fused schedule
    (0.9-1.3 ms per dispatch both ways, within run noise; grad path
    2.6 → 2.1 ms, also within noise across runs). XLA saturates this head;
    the kernel and its flag were removed (docs/results_r3/README.md §"Pallas
    close-out" has the full numbers).
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x = x.astype(compute_dtype)
    feat = _torso(params, cfg, x)
    if noise_key is None or noise_eps is not None:
        k_hv = k_ha = k_zv = k_za = None
    else:
        k_hv, k_ha, k_zv, k_za = jax.random.split(noise_key, 4)
    ne = noise_eps or {}
    ps = per_sample_noise
    v = noisy_linear(params["fc_z_v"],
                     jax.nn.relu(noisy_linear(params["fc_h_v"], feat, k_hv,
                                              per_sample=ps,
                                              eps=ne.get("fc_h_v"))),
                     k_zv, per_sample=ps, eps=ne.get("fc_z_v"))
    a = noisy_linear(params["fc_z_a"],
                     jax.nn.relu(noisy_linear(params["fc_h_a"], feat, k_ha,
                                              per_sample=ps,
                                              eps=ne.get("fc_h_a"))),
                     k_za, per_sample=ps, eps=ne.get("fc_z_a"))
    v = v.reshape(-1, 1, cfg.atoms)
    a = a.reshape(-1, action_space, cfg.atoms)
    q = v + a - a.mean(axis=1, keepdims=True)  # dueling combine, model.py:74-75
    q = q.astype(jnp.float32)  # softmax in f32 regardless of compute dtype
    if log:
        return jax.nn.log_softmax(q, axis=2)
    return jax.nn.softmax(q, axis=2)


def q_values(params: dict, cfg, action_space: int, support: jax.Array,
             x: jax.Array, noise_key: Optional[jax.Array] = None) -> jax.Array:
    """Expected Q per action: Σ_z z·p — reference agent.py:55."""
    probs = apply_dqn(params, cfg, action_space, x, noise_key)
    return (probs * support).sum(axis=2)
