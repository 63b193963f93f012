"""Cross-framework golden test: a reference-layout torch state dict converted
by utils/torch_import must produce the same eval-mode outputs as a torch
functional re-computation of the reference forward (model.py:69-80, μ-only
eval path of model.py:45-46)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import rainbow_tpu  # noqa: E402
from rainbow_tpu.models.dqn import apply_dqn  # noqa: E402
from rainbow_tpu.utils.torch_import import convert_state_dict  # noqa: E402


def make_reference_state_dict(rng, arch="data-efficient", hidden=64,
                              action_space=4, atoms=51, history=4):
    """Random tensors with the reference DQN's parameter names/shapes."""
    t = lambda *s: torch.tensor(rng.normal(0, 0.1, s).astype(np.float32))
    sd = {}
    if arch == "canonical":
        convs = [(0, 32, history, 8), (2, 64, 32, 4), (4, 64, 64, 3)]
        flat = 3136
    else:
        convs = [(0, 32, history, 5), (2, 64, 32, 5)]
        flat = 576
    for i, cout, cin, k in convs:
        sd[f"convs.{i}.weight"] = t(cout, cin, k, k)
        sd[f"convs.{i}.bias"] = t(cout)
    for name, din, dout in [("fc_h_v", flat, hidden), ("fc_h_a", flat, hidden),
                            ("fc_z_v", hidden, atoms),
                            ("fc_z_a", hidden, action_space * atoms)]:
        sd[f"{name}.weight_mu"] = t(dout, din)
        sd[f"{name}.weight_sigma"] = t(dout, din)
        sd[f"{name}.bias_mu"] = t(dout)
        sd[f"{name}.bias_sigma"] = t(dout)
    return sd, convs, flat


def torch_eval_forward(sd, x_nchw, convs, action_space, atoms):
    """The reference's eval-mode forward in torch functional ops."""
    import torch.nn.functional as F
    x = x_nchw
    strides = {8: 4, 4: 2, 3: 1, 5: 5}
    for i, cout, cin, k in convs:
        x = F.relu(F.conv2d(x, sd[f"convs.{i}.weight"],
                            sd[f"convs.{i}.bias"], stride=strides[k]))
    x = x.reshape(x.shape[0], -1)
    v = F.linear(F.relu(F.linear(x, sd["fc_h_v.weight_mu"],
                                 sd["fc_h_v.bias_mu"])),
                 sd["fc_z_v.weight_mu"], sd["fc_z_v.bias_mu"])
    a = F.linear(F.relu(F.linear(x, sd["fc_h_a.weight_mu"],
                                 sd["fc_h_a.bias_mu"])),
                 sd["fc_z_a.weight_mu"], sd["fc_z_a.bias_mu"])
    v = v.view(-1, 1, atoms)
    a = a.view(-1, action_space, atoms)
    q = v + a - a.mean(1, keepdim=True)
    return torch.softmax(q, dim=2)


@pytest.mark.parametrize("arch", ["data-efficient", "canonical"])
def test_converted_model_matches_torch_forward(arch):
    rng = np.random.default_rng(0)
    A, atoms = 4, 51
    hidden = 64
    sd, convs, flat = make_reference_state_dict(rng, arch, hidden, A, atoms)
    params = convert_state_dict(sd)

    x = rng.random((3, 4, 84, 84)).astype(np.float32)  # NCHW, [0,1]
    want = torch_eval_forward(sd, torch.tensor(x), convs, A, atoms).numpy()

    cfg = rainbow_tpu.canonical(architecture=arch, hidden_size=hidden)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = np.asarray(apply_dqn(params, cfg, A, x_nhwc, None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_legacy_conv_key_remap():
    """Pre-refactor checkpoints use conv1.weight keys (reference
    agent.py:29-32)."""
    rng = np.random.default_rng(1)
    sd, convs, _ = make_reference_state_dict(rng, "canonical", 32, 4)
    legacy = dict(sd)
    for new, old in [("convs.0", "conv1"), ("convs.2", "conv2"),
                     ("convs.4", "conv3")]:
        legacy[f"{old}.weight"] = legacy.pop(f"{new}.weight")
        legacy[f"{old}.bias"] = legacy.pop(f"{new}.bias")
    p1 = convert_state_dict(sd)
    p2 = convert_state_dict(legacy)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
