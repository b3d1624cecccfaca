"""Kernelized Movement Primitives (time-indexed GP conditioning).

Parity with ``policy_transportation/models/kernelized_movemement_primitives.py:6-82``:

* a GP over normalized time t ∈ [0,1] models the trajectory;
* trajectory waypoints are Hungarian-matched to source-distribution points;
* the time-GP is conditioned on the matched waypoint displacements:
  traj ← traj + k(t, t_m) (K_mm + σ²I)⁻¹ (target_m − source_m);
* a transportation covariance k(t,t) − k(t,t_m)(K_mm+σ²I)⁻¹k(t_m,t)
  is kept for std reporting and posterior sampling;
* ``predict`` returns the conditioned trajectory (it is time-indexed: the
  query X is ignored, exactly like the reference at lines 62-70).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels as K
from ..ops.assignment import match_waypoints, distance_matrix
from ..ops.linalg import add_diagonal, cho_solve_lower
from .gp_regressor import GaussianProcess
from . import exact_gp as gp_core

Array = jax.Array


def default_kmp_kernel() -> K.Kernel:
    """C(0.1, [0.1,2]) · RBF(0.1, [0.05,0.2]) + White(1e-5, [1e-5, 0.1]).

    Amplitude/lengthscale bounds follow the transport wrapper's default
    (``kernelized_movement_primitives_transportation.py:12``); the noise
    bound follows the comparison suite's kernel
    (``comparison_transportation.py:45``) — with the amplitude capped at 2
    and raw trajectories of variance ~10³, an UNbounded noise hyperopt
    collapses to "all noise" and the conditioned time-GP predicts the
    mean (the wrapper default is never exercised unbounded by the
    reference's benchmarks)."""
    return (
        K.Constant(0.1, bounds=(0.1, 2.0))
        * K.RBF(jnp.array([0.1]), bounds=(0.05, 0.2))
        + K.White(1e-5, bounds=(1e-5, 0.1))
    )


class KMP:
    def __init__(self, kernel: Optional[K.Kernel] = None, n_restarts: int = 5, seed: int = 0):
        self.kernel = kernel if kernel is not None else default_kmp_kernel()
        self.n_restarts = n_restarts
        self.seed = seed
        self.mask_traj: Optional[np.ndarray] = None
        self.mask_dist: Optional[np.ndarray] = None
        self.periodic: Optional[bool] = None

    def find_matching_waypoints(self, source_distribution, training_traj):
        traj = jnp.asarray(training_traj)
        seg = jnp.linalg.norm(traj[1:] - traj[:-1], axis=1)
        thr = 5.0 * jnp.max(seg)
        self.periodic = bool(jnp.linalg.norm(traj[0] - traj[-1]) < thr)
        return match_waypoints(traj, source_distribution)

    def fit(self, source_distribution, target_distribution, training_traj, kernel=None):
        if self.mask_traj is None:
            self.mask_traj, self.mask_dist = self.find_matching_waypoints(
                source_distribution, training_traj
            )
        kernel = kernel if kernel is not None else self.kernel
        traj = jnp.asarray(training_traj)
        n = traj.shape[0]
        self.time = jnp.linspace(0.0, 1.0, n)[:, None]

        gp = GaussianProcess(kernel, n_restarts_optimizer=self.n_restarts, seed=self.seed)
        gp.fit(self.time, traj)
        fitted_kernel = gp.kernel_
        noise_var = gp.noise_var_

        t_m = self.time[np.asarray(self.mask_traj)]
        k_star = fitted_kernel(self.time, t_m)  # (N, M) — cross: no White
        K_mm = fitted_kernel(t_m, t_m)
        L = jnp.linalg.cholesky(add_diagonal(K_mm, noise_var))
        disp = (
            jnp.asarray(target_distribution)[np.asarray(self.mask_dist)]
            - jnp.asarray(source_distribution)[np.asarray(self.mask_dist)]
        )
        self.training_traj = traj + k_star @ cho_solve_lower(L, disp)

        # refit the time-GP on the conditioned trajectory
        self.gp = GaussianProcess(kernel, n_restarts_optimizer=self.n_restarts, seed=self.seed)
        self.gp.fit(self.time, self.training_traj)

        cov = fitted_kernel(self.time, self.time) - k_star @ cho_solve_lower(L, k_star.T)
        self.transportation_cov = cov
        self.transportation_std = jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 0.0))
        return self

    def predict(self, X, return_std: bool = False):
        mean = self.gp.predict(self.time)
        if return_std:
            std = jnp.repeat(self.transportation_std[:, None], mean.shape[1], axis=1)
            return mean, std
        return mean

    def samples(self, X, n_samples: int = 10, key=None):
        """(n_samples, N, P) draws around the conditioned trajectory using
        the transportation covariance (reference lines 72-82)."""
        key = jax.random.PRNGKey(self.seed + 1) if key is None else key
        mean = self.gp.predict(self.time)
        L = jnp.linalg.cholesky(add_diagonal(self.transportation_cov, 1e-8))
        eps = jax.random.normal(key, (n_samples, mean.shape[0], mean.shape[1]))
        return mean[None] + jnp.einsum("ij,sjp->sip", L, eps)
