"""Diffeomorphism-aware GP transportation.

Parity with ``transportation/gaussian_process_transportation_diffeomorphic.py:14-167``:

* distribution save/load (npz pytree instead of raw pickle),
* ``check_invertibility`` — fit the inverse delta map (target → −delta) and
  measure the forward∘inverse residual Σ‖Ψ(x) + Ψ⁻¹(Φ(x))‖,
* ``diffeomorphism_error`` / ``optimize_diffeomorphism`` — search the RBF
  max-lengthscale bound minimizing that residual.

The reference runs Optuna TPE over one scalar (n_trials=100,
``:139-150``); a 1-D log-spaced sweep evaluated candidate-by-candidate is
deterministic, trivially parallel, and reproducible — so that is what we
ship (n_trials = grid resolution).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels as K
from ..models.gp_regressor import GaussianProcess
from .gpt import GaussianProcessTransportation

Array = jax.Array


class GaussianProcessTransportationDiffeo(GaussianProcessTransportation):
    def __init__(self, kernel_transport: Optional[K.Kernel] = None, **gp_kwargs):
        super().__init__(kernel_transport=kernel_transport, **gp_kwargs)
        self.kernel_transport = kernel_transport
        self.gp_kwargs = gp_kwargs

    # ---- persistence (reference :19-45, pickle → npz) --------------------
    def save_distributions(self, directory: str = "distributions"):
        os.makedirs(directory, exist_ok=True)
        np.savez(
            os.path.join(directory, "distributions.npz"),
            source=np.asarray(self.source_distribution),
            target=np.asarray(self.target_distribution),
        )

    def load_distributions(self, directory: str = "distributions"):
        path = os.path.join(directory, "distributions.npz")
        try:
            data = np.load(path)
            self.source_distribution = data["source"]
            self.target_distribution = data["target"]
        except (FileNotFoundError, OSError):
            print("No distributions saved")

    # ---- invertibility ---------------------------------------------------
    def _forward_inverse_residual(self) -> float:
        """Fit Ψ and the inverse map Ψ⁻¹ on (S1, −delta); residual of
        Ψ(γ(X)) + Ψ⁻¹(Φ(X)) summed over the trajectory (reference :109-121)."""
        method = self.method.delta_map
        aff = self.method.affine
        from ..models import affine as affine_core

        traj = jnp.asarray(self.training_traj)
        traj_rot = affine_core.predict(aff, traj)
        delta_mean, _ = method.predict(traj_rot, return_std=True)
        traj_target = traj_rot + delta_mean

        gp_inv = GaussianProcess(kernel=method.kernel, optimizer=None)
        gp_inv.fit(
            jnp.asarray(self.target_distribution),
            -jnp.asarray(self.method.delta_distribution),
        )
        delta_inv = gp_inv.predict(traj_target)
        self.traj_rotated_inv = traj_target + delta_inv
        return float(jnp.sum(jnp.linalg.norm(delta_mean + delta_inv, axis=1)))

    def check_invertibility(self) -> float:
        return self._forward_inverse_residual()

    def diffeomorphism_error(self, max_lengthscale: float) -> float:
        d = np.asarray(self.source_distribution).shape[1]
        kernel = (
            K.Constant(0.1)
            * K.RBF(2.0 * jnp.ones(d), bounds=(0.1, float(max_lengthscale)))
            + K.White(1e-4)
        )
        from ..transport.core import PolicyTransport

        self.method = PolicyTransport(GaussianProcess(kernel=kernel, **self.gp_kwargs))
        self.fit_transportation()
        return self._forward_inverse_residual()

    def optimize_diffeomorphism(
        self, n_trials: int = 20, low: float = 2.0, high: float = 20.0
    ) -> float:
        """Log-spaced sweep over the max-lengthscale bound; refits with the
        best value and returns it.

        Note: the bound only affects the fit when hyperparameter
        optimization is enabled (the default) — with ``optimizer=None`` the
        sweep is vacuous, exactly as in the reference workflow."""
        candidates = np.exp(np.linspace(np.log(low), np.log(high), n_trials))
        errors = [self.diffeomorphism_error(c) for c in candidates]
        best = float(candidates[int(np.argmin(errors))])
        self.best_max_lengthscale = best
        self.diffeo_errors = dict(zip(map(float, candidates), map(float, errors)))
        self.diffeomorphism_error(best)  # refit at the optimum
        return best
