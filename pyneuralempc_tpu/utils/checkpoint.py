"""Checkpoint / resume for model params and warm-start state.

SURVEY §5.4: the reference's closest analog is the mutable
``optimizer.prev_result`` plus pickling that silently drops TF handles
(``model/tensorflow.py:31-37``).  Here checkpointing is explicit: any
params pytree and :class:`~pyneuralempc_tpu.api.controller.WarmStart`
carry (single or batched) serialises to one ``.npz`` with the tree
structure stored alongside, so a fleet's receding-horizon state survives a
process restart bit-exactly.
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (structure is validated)."""
    with np.load(path) as data:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        n = len(leaves_like)
        stored = [k for k in data.files if k.startswith("leaf_")]
        if len(stored) != n:
            raise ValueError(
                f"checkpoint has {len(stored)} leaves, expected {n}")
        leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
        for got, want in zip(leaves, leaves_like):
            if want is not None and got.shape != want.shape:
                raise ValueError(
                    f"leaf shape mismatch: {got.shape} vs {want.shape}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
