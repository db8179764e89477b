"""Checkpoint save/load for training state.

The reference checkpoints by pickling the whole experiment object
(il_exp.py:424-429). Here checkpoints are explicit pytrees: saved with
orbax when available (the TPU-native, multi-host-safe path), falling back
to a plain numpy-pickle of the flattened tree.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

try:  # orbax is in the base image; guard anyway
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save(path: str, tree: Any) -> None:
    host_tree = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, tree
    )
    if _HAS_ORBAX and not path.endswith(".ckpt"):
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), host_tree, force=True)
        ckptr.wait_until_finished()
        return
    with open(path, "wb") as f:
        pickle.dump(host_tree, f)


def load(path: str) -> Any:
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)
