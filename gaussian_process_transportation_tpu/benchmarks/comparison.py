"""Surfaces comparison harness.

Parity with ``example/comparisons/surfaces/comparison_transportation.py:44-148``:
runs every transport method on the same drawing and produces the three
cross-method matrices the reference stores as LaTeX tables
(KL divergence, weighted distribution distance, Euclidean distance —
``results/{divergence,distribution_distance,euclidean distance}.txt``).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .. import kernels as K
from ..transport import (
    GaussianProcessTransportation,
    KMPTransport,
    LaplacianEditingTransport,
    MLPTransport,
    RandomForestTransport,
    EnsembleBijectiveTransport,
)
from ..utils import metrics
from ..utils.resample import resample


def default_methods() -> Dict[str, object]:
    """The reference's six methods with its kernel settings
    (``comparison_transportation.py:44-53``)."""
    k_transport = (
        K.Constant(np.sqrt(0.1), bounds=(0.1, 2.0))
        * K.RBF(10.0 * jnp.ones(2), bounds=(5.0, 500.0))
        + K.White(1e-4)
    )
    k_kmp = (
        K.Constant(0.1, bounds=(0.1, 2.0))
        * K.RBF(jnp.asarray([0.1]), bounds=(0.05, 0.1))
        + K.White(1e-5, bounds=(1e-5, 0.1))
    )
    return {
        "Kernelized Movement Primitives": KMPTransport(kernel=k_kmp),
        "Ensemble Random Forest": RandomForestTransport(),
        "Ensemble Neural Network": MLPTransport(),
        "Laplacian Editing": LaplacianEditingTransport(),
        "Ensemble Neural Flows": EnsembleBijectiveTransport(),
        "Gaussian Process Regression": GaussianProcessTransportation(
            kernel_transport=k_transport
        ),
    }


def run_comparison(
    demo: np.ndarray,
    source: np.ndarray,
    target: np.ndarray,
    methods: Optional[Dict[str, object]] = None,
    n_traj: int = 100,
    n_dist: int = 100,
) -> Dict[str, object]:
    """Fit+apply every method; return trajectories, stds, and the three
    cross-method matrices."""
    X = np.asarray(resample(jnp.asarray(demo), num_points=n_traj))
    S = np.asarray(resample(jnp.asarray(source), num_points=n_dist))
    S1 = np.asarray(resample(jnp.asarray(target), num_points=n_dist))
    dX = np.zeros_like(X)
    dX[:-1] = np.diff(X, axis=0)

    methods = methods or default_methods()
    trajs, stds = {}, {}
    for name, tr in methods.items():
        tr.source_distribution = S
        tr.target_distribution = S1
        tr.training_traj = X.copy()
        tr.training_delta = dX.copy()
        tr.fit_transportation()
        tr.apply_transportation()
        trajs[name] = np.asarray(tr.training_traj)
        stds[name] = np.maximum(np.asarray(tr.std), 1e-6)

    names = list(methods)
    n = len(names)
    divergence = np.zeros((n, n))
    distribution_distance = np.zeros((n, n))
    euclidean = np.zeros((n, n))
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            divergence[i, j] = float(
                metrics.gaussian_kl_divergence(
                    jnp.asarray(trajs[a]), jnp.asarray(stds[a]),
                    jnp.asarray(trajs[b]), jnp.asarray(stds[b]),
                )
            )
            distribution_distance[i, j] = float(
                metrics.weighted_distribution_distance(
                    jnp.asarray(trajs[a]), jnp.asarray(stds[a]),
                    jnp.asarray(trajs[b]), jnp.asarray(stds[b]),
                )
            )
            euclidean[i, j] = float(
                metrics.comparison_euclidean_distance(
                    jnp.asarray(trajs[a]), jnp.asarray(trajs[b])
                )
            )
    return {
        "names": names,
        "trajectories": trajs,
        "stds": stds,
        "divergence": divergence,
        "distribution_distance": distribution_distance,
        "euclidean_distance": euclidean,
    }


def save_array_as_latex(array: np.ndarray, path: str, names: Optional[List[str]] = None):
    """LaTeX table dump (parity with the reference's ``save_array_as_latex``)."""
    with open(path, "w") as f:
        f.write("\\begin{tabular}{" + "c" * (array.shape[1] + 1) + "}\n")
        for i, row in enumerate(array):
            label = names[i] if names else str(i)
            f.write(label + " & " + " & ".join(f"{v:.2f}" for v in row) + " \\\\\n")
        f.write("\\end{tabular}\n")
