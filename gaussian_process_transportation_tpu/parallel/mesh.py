"""Device-mesh helpers.

The framework's parallel axes (SURVEY.md §2d — all *new* relative to the
single-process reference):

* ``ens``  — ensemble/chain axis: transport ensembles, NUTS chains,
             multi-restart hyperopt.  Pure data parallelism over ICI.
* ``data`` — within-problem axis: trajectory/Gram rows for large-N
             problems (sequence-parallel analog).

A 1-chip mesh is the degenerate case, so every code path is written
against a mesh and runs unchanged from 1 chip to a pod.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_ens: Optional[int] = None,
    n_data: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_ens is None:
        n_ens = len(devices) // n_data
    use = devices[: n_ens * n_data]
    arr = np.asarray(use).reshape(n_ens, n_data)
    return Mesh(arr, ("ens", "data"))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ensemble) axis over the 'ens' mesh axis."""
    return NamedSharding(mesh, P("ens"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
