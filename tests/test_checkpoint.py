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
