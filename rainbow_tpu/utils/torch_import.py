"""Import reference PyTorch model checkpoints into rainbow-tpu params.

The reference saves/loads torch state dicts (reference agent.py:26-36,
106-107), including a legacy remap for pre-refactor checkpoints whose conv
keys were ``conv1.weight`` style (agent.py:29-32). This converter lets a
reference user bring their trained ``model.pth`` straight into this
framework:

    python -m rainbow_tpu.utils.torch_import model.pth model.npz \
        [--architecture canonical] [--hidden-size 512] [--action-space 6]
    python -m rainbow_tpu.cli --evaluate --model model.npz ...

Layout mapping:
  * torch Conv2d weight (out, in, kh, kw) [OIHW] → HWIO (kh, kw, in, out)
  * NoisyLinear weight_mu/weight_sigma (out, in) → w_mu/w_sigma (same)
  * biases map directly; noise buffers (weight_epsilon/bias_epsilon) are
    dropped — noise is key-derived here (models/noisy.py).
  * flat-feature ordering matches: both flatten conv activations in
    channel-major (NCHW) order (models/dqn.py _torso transposes before
    flattening for exactly this compatibility).
"""
from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


_LEGACY_CONV_REMAP = {  # reference agent.py:29-32
    "conv1.weight": "convs.0.weight", "conv1.bias": "convs.0.bias",
    "conv2.weight": "convs.2.weight", "conv2.bias": "convs.2.bias",
    "conv3.weight": "convs.4.weight", "conv3.bias": "convs.4.bias",
}


def convert_state_dict(state: Dict[str, "np.ndarray"]) -> dict:
    """torch state dict (tensors or ndarrays) → rainbow-tpu params pytree."""
    sd = {}
    for k, v in state.items():
        k = _LEGACY_CONV_REMAP.get(k, k)
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)())

    # Conv stack lives at convs.{0,2,4}.* (canonical) or convs.{0,2}.*
    # (data-efficient) — nn.Sequential indices skip the ReLUs.
    conv_indices = sorted({int(k.split(".")[1]) for k in sd
                           if k.startswith("convs.")})
    convs = []
    for i in conv_indices:
        w = sd[f"convs.{i}.weight"]  # (out, in, kh, kw)
        convs.append({
            "w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
            "b": sd[f"convs.{i}.bias"].astype(np.float32),
        })

    def noisy(prefix: str) -> dict:
        return {
            "w_mu": sd[f"{prefix}.weight_mu"].astype(np.float32),
            "w_sigma": sd[f"{prefix}.weight_sigma"].astype(np.float32),
            "b_mu": sd[f"{prefix}.bias_mu"].astype(np.float32),
            "b_sigma": sd[f"{prefix}.bias_sigma"].astype(np.float32),
        }

    return {
        "convs": convs,
        "fc_h_v": noisy("fc_h_v"),
        "fc_h_a": noisy("fc_h_a"),
        "fc_z_v": noisy("fc_z_v"),
        "fc_z_a": noisy("fc_z_a"),
    }


def import_torch_model(pth_path: str, out_path: str) -> dict:
    import torch

    from rainbow_tpu import checkpoint as ckpt

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    params = convert_state_dict(state)
    ckpt.save_params(out_path, params)
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description="torch model.pth -> model.npz")
    p.add_argument("pth")
    p.add_argument("out")
    args = p.parse_args(argv)
    params = import_torch_model(args.pth, args.out)
    n = sum(int(np.prod(np.shape(l)))
            for l in __import__("jax").tree_util.tree_leaves(params))
    print(f"Converted {args.pth} -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
