"""Atomic full-state checkpointing.

The reference persists three partial artifacts — best/periodic model
state-dicts via torch.save (reference agent.py:106-107, main.py:181-182),
the replay memory as a bz2 pickle (main.py:85-100), and metrics.pth
(test.py:51) — and resume restores only weights+memory, losing optimiser
moments, step counter and β (SURVEY.md §3.4). Here ONE atomic checkpoint
holds the complete training state pytree {agent (params, target, opt state,
PRNG keys, step), replay arrays, step counter, metrics}, written as
npz(+pickled treedef) to a temp file and renamed, so resume is exact.

Large replay-bearing saves are deflate-compressed (level 1 — fast, and Atari
frames compress 3-10x), the analogue of the reference's bz2 pickling
(main.py:85-100 — opt-out via --disable-bzip-memory; here via compress=False).

Sharding-safe: leaves that are jax.Arrays distributed over a multi-process
mesh are saved as this process's addressable portion only (concatenated
leading-axis shards; replicated leaves collapse to one copy) — each host
writes its own file and restore re-globalizes over the mesh
(parallel/multihost.globalize). np.asarray on a non-addressable array would
either fail or materialise the full global array on one host.
"""
from __future__ import annotations

import os
import pickle
import zipfile
from typing import Any

import jax
import numpy as np
from numpy.lib import format as npformat

import ml_dtypes

_BF16 = np.dtype(ml_dtypes.bfloat16)


def _is_prng_key(x) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


def _covers_all(index, shape) -> bool:
    """True if a shard index tuple is the trivial full-array slice."""
    return all(sl.start in (None, 0) and sl.stop in (None, n)
               for sl, n in zip(index, shape))


def _host_local(leaf: jax.Array) -> tuple:
    """This process's portion of a (possibly multi-process) jax.Array.

    Returns (ndarray, is_shard): is_shard=True means the array was
    leading-axis-sharded across processes and ndarray is only the local
    slice (restore must re-globalize); False means the value is complete
    (replicated or single-process)."""
    if not isinstance(leaf, jax.Array) or leaf.is_fully_addressable:
        return np.asarray(leaf), False
    by_index = {}
    for s in leaf.addressable_shards:  # dedupe replicas on local devices
        by_index.setdefault(tuple((sl.start, sl.stop) for sl in s.index), s)
    shards = list(by_index.values())
    if len(shards) == 1 and _covers_all(shards[0].index, leaf.shape):
        return np.asarray(shards[0].data), False  # replicated
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0), True


def _write_npz(path: str, arrays: dict, compress: bool) -> None:
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    kw = {"compresslevel": 1} if compress else {}
    with zipfile.ZipFile(path, "w", mode, allowZip64=True, **kw) as zf:
        for name, arr in arrays.items():
            arr = np.asarray(arr)
            if not arr.flags.c_contiguous:
                # NOT ascontiguousarray: it silently promotes 0-d to (1,).
                arr = arr.copy(order="C")
            with zf.open(name + ".npy", "w", force_zip64=True) as af:
                npformat.write_array(af, arr, allow_pickle=False)


def save_pytree(path: str, tree: Any, compress: bool = False) -> None:
    """Atomically save an arbitrary pytree of arrays/scalars (typed PRNG-key
    leaves are stored as their raw key_data and re-wrapped on load). In a
    multi-process run each process must call this with its OWN path (e.g. a
    .proc{i} suffix): cross-process leaves are saved as the local shard."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays, is_key, is_shard, is_bf16 = {}, [], [], []
    for i, leaf in enumerate(leaves):
        if _is_prng_key(leaf):
            leaf = jax.random.key_data(leaf)
            is_key.append(True)
        else:
            is_key.append(False)
        arr, shard = _host_local(leaf)
        if arr.dtype == _BF16:
            # numpy's npy format round-trips ml_dtypes.bfloat16 as an opaque
            # void dtype; store the raw bits as uint16 and mark the leaf.
            arr = arr.view(np.uint16)
            is_bf16.append(True)
        else:
            is_bf16.append(False)
        is_shard.append(shard)
        arrays[f"arr_{i}"] = arr
    arrays["treedef"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    arrays["is_key"] = np.asarray(is_key)
    arrays["is_shard"] = np.asarray(is_shard)
    arrays["is_bf16"] = np.asarray(is_bf16)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _write_npz(tmp, arrays, compress)
    os.replace(tmp, path)


def load_pytree(path: str, return_shard_mask: bool = False) -> Any:
    """Load a pytree saved by save_pytree. For multi-process checkpoints the
    sharded leaves come back as the saving process's LOCAL slice; pass
    return_shard_mask=True to also get the same-structure boolean pytree
    marking which leaves need re-globalizing (parallel/multihost.globalize)."""
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["treedef"].tobytes())
        is_key = z["is_key"]
        is_shard = z["is_shard"] if "is_shard" in z.files else \
            np.zeros_like(is_key)
        is_bf16 = z["is_bf16"] if "is_bf16" in z.files else \
            np.zeros_like(is_key)
        leaves = [z[f"arr_{i}"] for i in range(len(is_key))]
    leaves = [l.view(_BF16) if b else l for l, b in zip(leaves, is_bf16)]
    leaves = [jax.random.wrap_key_data(jax.numpy.asarray(l)) if k else l
              for l, k in zip(leaves, is_key)]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    if return_shard_mask:
        mask = jax.tree_util.tree_unflatten(treedef,
                                            [bool(s) for s in is_shard])
        return tree, mask
    return tree


def save_params(path: str, params: Any) -> None:
    """Model-weights-only save — the analogue of the reference's model.pth
    (agent.py:106-107)."""
    save_pytree(path, params)


def load_params(path: str) -> Any:
    if not os.path.isfile(path):
        raise FileNotFoundError(path)  # reference agent.py:35-36
    return load_pytree(path)
