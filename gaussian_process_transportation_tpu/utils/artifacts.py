"""Versioned on-disk artifact store (checkpoint / resume).

The reference persists everything as hand-named pickles (distributions,
trajectories: ``main_tags.py:44-87``,
``gaussian_process_transportation_diffeomorphic.py:19-45``) and never
checkpoints model state — GPs are refit from data on every run.

Here any pytree (fitted ``ExactGP`` states, SVGP params, sampler chains,
transport results) round-trips through flat npz files with a JSON treedef
sidecar, so long fits and NUTS runs resume exactly.  No pickle — artifacts
are portable and inspectable.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    """Save a pytree of arrays to ``<path>.npz`` (+ ``<path>.json`` treedef)."""
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "n_leaves": len(flat),
                "metadata": metadata or {},
                "version": 1,
            },
            f,
        )


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``like`` (an exemplar pytree with the same treedef)."""
    data = np.load(path + ".npz")
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(flat_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    leaves = [
        np.asarray(l, dtype=np.asarray(exemplar).dtype)
        for l, exemplar in zip(leaves, flat_like)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> Dict:
    with open(path + ".json") as f:
        return json.load(f)["metadata"]


class ArtifactStore:
    """Named artifact directory with simple versioning."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str, version: Optional[int] = None) -> str:
        if version is None:
            version = self.latest_version(name) + 1
        return os.path.join(self.root, f"{name}.v{version}")

    def latest_version(self, name: str) -> int:
        versions = [
            int(f.split(".v")[-1].split(".")[0])
            for f in os.listdir(self.root)
            if f.startswith(name + ".v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def save(self, name: str, tree: Any, metadata: Optional[Dict] = None) -> int:
        v = self.latest_version(name) + 1
        save_pytree(os.path.join(self.root, f"{name}.v{v}"), tree, metadata)
        return v

    def load(self, name: str, like: Any, version: Optional[int] = None) -> Any:
        v = version if version is not None else self.latest_version(name)
        if v == 0:
            raise FileNotFoundError(f"no artifact named {name!r} in {self.root}")
        return load_pytree(os.path.join(self.root, f"{name}.v{v}"), like)
