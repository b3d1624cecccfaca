"""Offline analysis of recorded robot experiments.

Parity with ``robot_experiments/data_analysis_cleaning.py:118-171`` (and
its dressing/pnp siblings): given a set of recorded target distributions
(point clouds across repetitions of a task), compute the pairwise
generalization matrices — directed-Hausdorff, Chamfer, max-squared-error,
and PCA-aligned distances — plus force-norm traces from recorded wrenches.

Loads the reference's committed artifacts when present (pickles of numpy
arrays and npz recordings, ``robot_experiments/results/**``); all metric
math runs on-device via :mod:`..utils.metrics`.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import metrics


def load_recorded_distributions(directory: str) -> List[np.ndarray]:
    """Load source.pkl + target_*.pkl point sets from a results directory
    (reference layout: ``robot_experiments/results/cleaning``)."""
    out = []
    src = os.path.join(directory, "source.pkl")
    if os.path.exists(src):
        with open(src, "rb") as f:
            out.append(np.asarray(pickle.load(f)))
    i = 0
    while True:
        path = os.path.join(directory, f"target_{i}.pkl")
        if not os.path.exists(path):
            break
        with open(path, "rb") as f:
            out.append(np.asarray(pickle.load(f)))
        i += 1
    return out


def distribution_distance_matrices(point_sets: Sequence[np.ndarray]) -> Dict[str, np.ndarray]:
    """Pairwise Hausdorff/Chamfer/max-MSE/PCA matrices
    (``data_analysis_cleaning.py:125-147``)."""
    n = len(point_sets)
    sets = [jnp.asarray(np.asarray(p, dtype=np.float64)) for p in point_sets]
    hausdorff = np.zeros((n, n))
    chamfer = np.zeros((n, n))
    max_mse = np.zeros((n, n))
    pca_dist = np.zeros((n, n))

    def pca_align(p):
        c = p - p.mean(axis=0)
        U, S, Vt = jnp.linalg.svd(c, full_matrices=False)
        return c @ Vt.T

    for i in range(n):
        for j in range(n):
            a, b = sets[i], sets[j]
            hausdorff[i, j] = float(metrics.hausdorff_distance(a, b))
            chamfer[i, j] = float(metrics.chamfer_distance(a, b))
            if a.shape == b.shape:
                max_mse[i, j] = float(jnp.max(jnp.sum((a - b) ** 2, axis=1)))
                pa, pb = pca_align(a), pca_align(b)
                pca_dist[i, j] = float(jnp.mean(jnp.sum((pa - pb) ** 2, axis=1)))
            else:
                max_mse[i, j] = np.nan
                pca_dist[i, j] = np.nan
    return {
        "hausdorff": hausdorff,
        "chamfer": chamfer,
        "max_mse": max_mse,
        "pca": pca_dist,
    }


def force_norm_trace(recording: Dict[str, np.ndarray], rate_hz: float = 20.0):
    """(time, ‖F‖) from a recorded wrench array (recorder node layout:
    ``recorded_force_torque`` with rows Fx, Fy, Fz, ...)."""
    ft = np.asarray(recording["recorded_force_torque"])
    force = ft[:3] if ft.shape[0] in (3, 6) else ft[:, :3].T
    norm = np.linalg.norm(force, axis=0)
    t = np.arange(len(norm)) / rate_hz
    return t, norm
