"""Atomic full-state checkpointing.

The reference persists three partial artifacts — best/periodic model
state-dicts via torch.save (reference agent.py:106-107, main.py:181-182),
the replay memory as a bz2 pickle (main.py:85-100), and metrics.pth
(test.py:51) — and resume restores only weights+memory, losing optimiser
moments, step counter and β (SURVEY.md §3.4). Here ONE atomic checkpoint
holds the complete training state pytree {agent (params, target, opt state,
PRNG keys, step), replay arrays, step counter, metrics}, written as
npz(+pickled treedef) to a temp file and renamed, so resume is exact.
Saving the (large) replay arrays is optional, like the reference's
--memory flag.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _is_prng_key(x) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


def save_pytree(path: str, tree: Any) -> None:
    """Atomically save an arbitrary pytree of arrays/scalars (typed PRNG-key
    leaves are stored as their raw key_data and re-wrapped on load)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs, is_key = [], []
    for leaf in leaves:
        if _is_prng_key(leaf):
            arrs.append(np.asarray(jax.random.key_data(leaf)))
            is_key.append(True)
        else:
            arrs.append(np.asarray(leaf))
            is_key.append(False)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, *arrs, treedef=np.frombuffer(
            pickle.dumps(treedef), dtype=np.uint8),
            is_key=np.asarray(is_key))
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["treedef"].tobytes())
        is_key = z["is_key"]
        leaves = [z[f"arr_{i}"] for i in range(len(is_key))]
    leaves = [jax.random.wrap_key_data(jax.numpy.asarray(l)) if k else l
              for l, k in zip(leaves, is_key)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(path: str, params: Any) -> None:
    """Model-weights-only save — the analogue of the reference's model.pth
    (agent.py:106-107)."""
    save_pytree(path, params)


def load_params(path: str) -> Any:
    if not os.path.isfile(path):
        raise FileNotFoundError(path)  # reference agent.py:35-36
    return load_pytree(path)
