"""Checkpoint format tests: compression, PRNG keys, sharded leaves."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rainbow_tpu import checkpoint as ckpt


def _tree(seed=0):
    k = jax.random.key(seed)
    return {
        "params": {"w": jax.random.normal(k, (32, 16)),
                   "b": jnp.zeros((16,))},
        "frames": jnp.tile(jnp.arange(84, dtype=jnp.uint8), (64, 84)),
        "key": jax.random.key(seed + 1),
        "step": jnp.int32(7),
    }


def test_roundtrip_uncompressed(tmp_path):
    t = _tree()
    p = os.path.join(str(tmp_path), "a.npz")
    ckpt.save_pytree(p, t)
    back = ckpt.load_pytree(p)
    for a, b in zip(jax.tree_util.tree_leaves(t),
                    jax.tree_util.tree_leaves(back)):
        if jax.dtypes.issubdtype(getattr(a, "dtype", None),
                                 jax.dtypes.prng_key):
            np.testing.assert_array_equal(jax.random.key_data(a),
                                          jax.random.key_data(b))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compressed_roundtrip_and_smaller(tmp_path):
    """Replay-like frame payloads must deflate (reference bz2-compresses its
    memory pickle, main.py:85-100) and restore bit-exactly."""
    frames = jnp.tile(jnp.arange(84, dtype=jnp.uint8)[None, :], (512, 7056 // 84))
    t = {"frames": frames, "priorities": jnp.ones((512,), jnp.float32)}
    raw = os.path.join(str(tmp_path), "raw.npz")
    comp = os.path.join(str(tmp_path), "comp.npz")
    ckpt.save_pytree(raw, t, compress=False)
    ckpt.save_pytree(comp, t, compress=True)
    assert os.path.getsize(comp) < os.path.getsize(raw) / 3, (
        os.path.getsize(comp), os.path.getsize(raw))
    back = ckpt.load_pytree(comp)
    np.testing.assert_array_equal(np.asarray(back["frames"]),
                                  np.asarray(frames))


def test_sharded_leaf_roundtrip_single_process(tmp_path):
    """On a multi-device (single-process) mesh every shard is addressable:
    save must reassemble the full array and mark it non-shard."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ("data",))
    x = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    rep = jax.device_put(jnp.float32(3.5), NamedSharding(mesh, P()))
    p = os.path.join(str(tmp_path), "s.npz")
    ckpt.save_pytree(p, {"x": xs, "r": rep})
    back, mask = ckpt.load_pytree(p, return_shard_mask=True)
    np.testing.assert_array_equal(np.asarray(back["x"]), np.asarray(x))
    assert float(back["r"]) == 3.5
    assert mask == {"x": False, "r": False}  # fully addressable: complete


def test_restore_flattened_optimizer_state(tmp_path):
    """Optimizer-layout migration, both directions. Rounds 3-4 wrapped the
    chain in optax.flatten (one ravelled moment vector); round 5 went back
    to the per-leaf chain for speed. Checkpoints written under EITHER
    layout must restore into the current one with the Adam moments intact
    (ravelled/unravelled in params order), not re-initialised — e.g. the
    committed pong_20m checkpoints store flat moments."""
    import optax
    from jax.flatten_util import ravel_pytree

    import rainbow_tpu
    from rainbow_tpu import agent as ag
    from rainbow_tpu import checkpoint as ckpt

    cfg = rainbow_tpu.data_efficient(num_envs=2, memory_capacity=2 * 64,
                                     hidden_size=16, multi_step=3)
    agent = ag.init_agent(jax.random.key(0), cfg, 4)
    # Fabricate the round-3/4 FLAT structure with distinctive moments.
    legacy_opt = optax.flatten(optax.chain(
        optax.clip_by_global_norm(cfg.norm_clip),
        optax.adam(cfg.learning_rate, eps=cfg.adam_eps)))
    legacy_state = legacy_opt.init(agent.params)
    distinct_mu = jax.tree.map(
        lambda p: jnp.full_like(p, 0.25), agent.params)
    distinct_nu = jax.tree.map(lambda p: jnp.full_like(p, 0.5), agent.params)
    adam_inner = legacy_state[1][0]._replace(
        mu=ravel_pytree(distinct_mu)[0], nu=ravel_pytree(distinct_nu)[0])
    legacy_state = (legacy_state[0],
                    (adam_inner,) + tuple(legacy_state[1][1:]))
    agent_legacy = agent.replace(opt_state=legacy_state)
    path = str(tmp_path / "legacy.npz")
    ckpt.save_pytree(path, {"agent": agent_legacy})
    restored = ckpt.load_pytree(path)["agent"]
    adapted = ag.adapt_opt_state(
        jax.tree.map(jnp.asarray, restored), cfg)
    fresh = ag.make_optimizer(cfg).init(agent.params)
    assert jax.tree_util.tree_structure(adapted.opt_state) == \
        jax.tree_util.tree_structure(fresh)
    adapted_mu = adapted.opt_state[1][0].mu
    for got, want in zip(jax.tree_util.tree_leaves(adapted_mu),
                         jax.tree_util.tree_leaves(distinct_mu)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    # And the adapted state must be immediately usable.
    grads = jax.tree.map(jnp.ones_like, agent.params)
    ag.apply_grads(adapted, cfg, grads, adapted.rng)

    # Same-layout checkpoints pass through untouched.
    current = ag.make_optimizer(cfg).init(agent.params)
    same = ag.adapt_opt_state(agent.replace(opt_state=current), cfg)
    assert jax.tree_util.tree_structure(same.opt_state) == \
        jax.tree_util.tree_structure(current)


def test_bfloat16_leaves_roundtrip_exact(tmp_path):
    """bf16 leaves (e.g. Adam mu under cfg.adam_mu_dtype='bfloat16') must
    round-trip bit-exactly: numpy's npy format loads ml_dtypes.bfloat16 back
    as an opaque void dtype, so save_pytree stores the raw bits as uint16
    with an is_bf16 marker."""
    import ml_dtypes

    tree = {
        "bf": jnp.arange(7, dtype=jnp.bfloat16) * 0.3,
        "f32": jnp.arange(5, dtype=jnp.float32),
        "scalar_bf": jnp.asarray(1.5, jnp.bfloat16),
    }
    path = str(tmp_path / "bf16.npz")
    ckpt.save_pytree(path, tree)
    back = ckpt.load_pytree(path)
    for k in tree:
        a, b = np.asarray(tree[k]), np.asarray(back[k])
        assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
        assert a.tobytes() == b.tobytes(), k
    assert np.asarray(back["bf"]).dtype == np.dtype(ml_dtypes.bfloat16)
