"""Transport variants: one wrapper per delta-map model family.

All follow the reference's attribute-driven protocol (set
``.source_distribution``, ``.target_distribution``, ``.training_traj``,
optionally ``.training_delta``/``.training_ori``; call
``fit_transportation()``, ``apply_transportation()``,
``sample_transportation()``):

* ``AffineTransportation``       — affine-only baseline
  (``transportation/affine_transportation.py:13-51``)
* ``KMPTransport``               — KMP conditioning
  (``kernelized_movement_primitives_transportation.py:11-45``)
* ``LaplacianEditingTransport``  — graph-Laplacian editing
  (``laplacian_editing_transportation.py:10-42``)
* ``MLPTransport``               — Ensemble-NN delta map
  (``multi_layer_perceptron_transportation.py:10-43``)
* ``RandomForestTransport``      — Ensemble-RF delta map
  (``random_forest_transportation.py:10-45``)
* ``NeuralTransport``            — single-MLP delta map
  (``torch/neural_network_transport.py:13-79``; that file has a latent
  fit/predict attribute bug we do not reproduce)
* ``BijectiveTransport``         — RealNVP flow fits Φ directly
  (``torch/bijective_transport.py:12-58``)
* ``EnsembleNeuralTransport``    — vmapped MLP ensemble with Jacobian-var
  velocity uncertainty (``torch/ensemble_neural_network_transport.py``)
* ``EnsembleBijectiveTransport`` — vmapped flow ensemble
  (``torch/ensemble_bijective_transport.py``)
* ``SVGPTransport``              — sparse variational GP with derivative
  posteriors (``torch/stocastic_variational_gaussian_process_transportation.py:12-102``)
* ``GMRTransport``               — GMM/GMR map fits Φ directly
  (``example/comparisons/surfaces/surface_generalization_with_gmm.py:62-67``)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.affine import AffineTransform
from ..models.kmp import KMP
from ..models.laplacian_editing import LaplacianEditing
from ..models.mlp import MLP, EnsembleMLP
from ..models.flows import BijectiveNetwork, EnsembleBijectiveNetwork
from ..models.random_forest import EnsembleRandomForest
from ..models.svgp import StochasticVariationalGaussianProcess
from ..models.gmr import GMR
from ..ops import quaternion as quat

Array = jax.Array


def finite_difference_jacobian(traj_new: Array, traj_old: Array) -> Array:
    """Per-step FD Jacobian J_i = Δtraj_new_i · pinv(Δtraj_old_i), last row
    repeated — the velocity transport used by the KMP/LE/MLP/RF variants
    (e.g. ``kernelized_movement_primitives_transportation.py:37-39``)."""
    dn = (traj_new[1:] - traj_new[:-1])[:, :, None]  # (N-1, D, 1)
    do = (traj_old[1:] - traj_old[:-1])[:, :, None]
    J = dn @ jnp.linalg.pinv(do)
    return jnp.concatenate([J, J[-1:]], axis=0)


class _FDVelocityMixin:
    """apply_transportation with finite-difference velocity push-forward."""

    def _apply_fd_velocity(self):
        if getattr(self, "training_delta", None) is not None:
            J = finite_difference_jacobian(
                jnp.asarray(self.training_traj), jnp.asarray(self.training_traj_old)
            )
            self.training_delta = (J @ jnp.asarray(self.training_delta)[:, :, None])[
                :, :, 0
            ]


class AffineTransportation:
    """Affine-only transport: traj/delta/ori through γ, zero residual
    uncertainty (``affine_transportation.py:13-51``)."""

    def __init__(self, do_scale: bool = False, do_rotation: bool = True):
        self.affine_transform = AffineTransform(do_scale=do_scale, do_rotation=do_rotation)

    def fit_transportation(self, do_scale=None, do_rotation=None):
        if do_scale is not None or do_rotation is not None:
            self.affine_transform = AffineTransform(
                do_scale=bool(do_scale), do_rotation=True if do_rotation is None else bool(do_rotation)
            )
        self.affine_transform.fit(self.source_distribution, self.target_distribution)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.training_traj = self.affine_transform.predict(self.training_traj_old)
        self.std = jnp.zeros_like(self.training_traj)
        if getattr(self, "training_delta", None) is not None:
            J = self.affine_transform.derivative(self.training_traj_old)
            self.training_delta = (J @ jnp.asarray(self.training_delta)[:, :, None])[:, :, 0]
            self.var_vel_transported = jnp.zeros_like(self.training_delta)
        if getattr(self, "training_ori", None) is not None:
            q = jnp.asarray(self.training_ori)
            q_aff = quat.from_rotation_matrix(self.affine_transform.rotation_matrix)
            self.training_ori = quat.multiply(q_aff[None], q)

    def sample_transportation(self):
        return self.training_traj[None]


class KMPTransport(_FDVelocityMixin):
    def __init__(self, kernel=None, do_scale: bool = False, do_rotation: bool = True):
        self.affine_transform = AffineTransform(do_scale=do_scale, do_rotation=do_rotation)
        self.transportation = KMP(kernel=kernel)

    def fit_transportation(self):
        self.transportation.mask_traj, self.transportation.mask_dist = (
            self.transportation.find_matching_waypoints(
                self.source_distribution, self.training_traj
            )
        )
        self.affine_transform.fit(self.source_distribution, self.target_distribution)
        source_aligned = self.affine_transform.predict(self.source_distribution)
        self.training_traj = self.affine_transform.predict(self.training_traj)
        self.transportation.fit(source_aligned, self.target_distribution, self.training_traj)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        self.training_traj, self.std = self.transportation.predict(
            self.traj_rotated, return_std=True
        )
        self._apply_fd_velocity()

    def sample_transportation(self):
        return self.transportation.samples(self.traj_rotated)


class LaplacianEditingTransport(_FDVelocityMixin):
    def __init__(self):
        self.affine_transform = AffineTransform(do_scale=True, do_rotation=True)
        self.transportation = LaplacianEditing()

    def fit_transportation(self):
        self.affine_transform.fit(self.source_distribution, self.target_distribution)
        source_aligned = self.affine_transform.predict(self.source_distribution)
        self.training_traj = self.affine_transform.predict(self.training_traj)
        self.transportation.fit(source_aligned, self.target_distribution, self.training_traj)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        self.training_traj, self.std = self.transportation.predict(
            self.traj_rotated, return_std=True
        )
        self._apply_fd_velocity()

    def sample_transportation(self):
        return self.transportation.samples(self.traj_rotated)


class _DeltaMapTransport(_FDVelocityMixin):
    """Shared: affine + residual delta map + FD velocity."""

    def _fit_delta(self, model, do_scale=False, do_rotation=True):
        self.affine_transform = AffineTransform(do_scale=do_scale, do_rotation=do_rotation)
        self.affine_transform.fit(self.source_distribution, self.target_distribution)
        source_aligned = self.affine_transform.predict(self.source_distribution)
        self.delta_distribution = jnp.asarray(self.target_distribution) - source_aligned
        self.delta_map = model
        return source_aligned

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        mean, self.std = self.delta_map.predict(self.traj_rotated, return_std=True)
        self.training_traj = self.traj_rotated + mean
        self._apply_fd_velocity()

    def sample_transportation(self):
        return self.traj_rotated[None] + self.delta_map.samples(self.traj_rotated)


class MLPTransport(_DeltaMapTransport):
    def __init__(self, n_estimators: int = 10, **mlp_kw):
        self.n_estimators = n_estimators
        self.mlp_kw = mlp_kw

    def fit_transportation(self):
        src = self._fit_delta(EnsembleMLP(n_estimators=self.n_estimators))
        self.delta_map.fit(src, self.delta_distribution, **self.mlp_kw)


class RandomForestTransport(_DeltaMapTransport):
    def __init__(self, n_estimators: int = 50, max_depth: int = 5):
        self.n_estimators = n_estimators
        self.max_depth = max_depth

    def fit_transportation(self):
        src = self._fit_delta(
            EnsembleRandomForest(n_estimators=self.n_estimators, max_depth=self.max_depth)
        )
        self.delta_map.fit(src, self.delta_distribution)


class NeuralTransport(_DeltaMapTransport):
    """Single-MLP delta map with autodiff-Jacobian velocity transport."""

    def __init__(self, **mlp_kw):
        self.mlp_kw = mlp_kw

    def fit_transportation(self, num_epochs: int = 200):
        src = self._fit_delta(MLP(**self.mlp_kw))
        self.delta_map.fit(src, self.delta_distribution, num_epochs=num_epochs)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        mean, self.std = self.delta_map.predict(self.traj_rotated, return_std=True)
        self.training_traj = self.traj_rotated + mean
        if getattr(self, "training_delta", None) is not None:
            J_psi = self.delta_map.derivative(self.traj_rotated)
            J_gamma = self.affine_transform.derivative(self.training_traj_old)
            J_phi = J_gamma + J_psi @ J_gamma
            self.training_delta = (J_phi @ jnp.asarray(self.training_delta)[:, :, None])[:, :, 0]


class EnsembleNeuralTransport(_DeltaMapTransport):
    """Vmapped MLP-ensemble delta map with Jacobian-variance velocity
    uncertainty (``torch/ensemble_neural_network_transport.py:73-86``)."""

    def __init__(self, n_estimators: int = 10, **mlp_kw):
        self.n_estimators = n_estimators
        self.mlp_kw = mlp_kw

    def fit_transportation(self, num_epochs: int = 200):
        src = self._fit_delta(EnsembleMLP(n_estimators=self.n_estimators))
        self.delta_map.fit(src, self.delta_distribution, num_epochs=num_epochs, **self.mlp_kw)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        mean, self.std = self.delta_map.predict(self.traj_rotated, return_std=True)
        self.training_traj = self.traj_rotated + mean
        if getattr(self, "training_delta", None) is not None:
            J_psi, J_psi_var = self.delta_map.derivative(self.traj_rotated, return_var=True)
            J_gamma = self.affine_transform.derivative(self.training_traj_old)
            J_phi = J_gamma + J_psi @ J_gamma
            v = jnp.asarray(self.training_delta)[:, :, None]
            v_rot = J_gamma @ v
            self.var_vel_transported = (J_psi_var @ v_rot**2)[:, :, 0]
            self.training_delta = (J_phi @ v)[:, :, 0]


class BijectiveTransport:
    """Flow fits Φ directly: source→target; trajectory replaced by Φ(traj),
    velocities through the exact flow Jacobian
    (``torch/bijective_transport.py:12-58``)."""

    def __init__(self, num_blocks: int = 4, num_hidden: int = 20, seed: int = 0):
        self.num_blocks = num_blocks
        self.num_hidden = num_hidden
        self.seed = seed

    def fit_transportation(self, num_epochs: int = 200):
        self.model = BijectiveNetwork(
            np.asarray(self.source_distribution),
            np.asarray(self.target_distribution),
            num_blocks=self.num_blocks,
            num_hidden=self.num_hidden,
            seed=self.seed,
        )
        self.model.fit(num_epochs=num_epochs)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.training_traj = self.model.predict(self.training_traj_old)
        self.std = jnp.zeros_like(self.training_traj)
        if getattr(self, "training_delta", None) is not None:
            J = self.model.derivative(self.training_traj_old)
            self.training_delta = (J @ jnp.asarray(self.training_delta)[:, :, None])[:, :, 0]

    def sample_transportation(self):
        return self.training_traj[None]


class EnsembleBijectiveTransport:
    """Flow-ensemble transport: mean/std + Jacobian variance
    (``torch/ensemble_bijective_transport.py:12-93``; "Ensemble Neural
    Flows" in the comparison suite)."""

    def __init__(self, n_estimators: int = 10, num_blocks: int = 4, num_hidden: int = 20, seed: int = 0):
        self.n_estimators = n_estimators
        self.num_blocks = num_blocks
        self.num_hidden = num_hidden
        self.seed = seed

    def fit_transportation(self, num_epochs: int = 200):
        self.model = EnsembleBijectiveNetwork(
            np.asarray(self.source_distribution),
            np.asarray(self.target_distribution),
            n_estimators=self.n_estimators,
            num_blocks=self.num_blocks,
            num_hidden=self.num_hidden,
            seed=self.seed,
        )
        self.model.fit(num_epochs=num_epochs)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.training_traj, self.std = self.model.predict(
            self.training_traj_old, return_std=True
        )
        if getattr(self, "training_delta", None) is not None:
            J, J_var = self.model.derivative(self.training_traj_old, return_var=True)
            v = jnp.asarray(self.training_delta)[:, :, None]
            self.var_vel_transported = (J_var @ v**2)[:, :, 0]
            self.training_delta = (J @ v)[:, :, 0]

    def sample_transportation(self):
        return self.model.samples(self.training_traj_old)


class GMRTransport:
    """GMM/GMR transport: affine pre-align, then a joint GMM over
    (γ(S), S1) whose conditional mean maps the trajectory directly —
    the reference's ``surface_generalization_with_gmm.py:60-67`` pipeline.
    Velocities go through the analytic GMR Jacobian (an upgrade: the
    reference demo transports positions only)."""

    def __init__(self, n_components: int = 10, n_iter: int = 100, seed: int = 0,
                 do_scale: bool = False, do_rotation: bool = True):
        self.n_components = n_components
        self.n_iter = n_iter
        self.seed = seed
        self.do_scale = do_scale
        self.do_rotation = do_rotation

    def fit_transportation(self):
        self.affine_transform = AffineTransform(
            do_scale=self.do_scale, do_rotation=self.do_rotation
        )
        self.affine_transform.fit(self.source_distribution, self.target_distribution)
        source_aligned = self.affine_transform.predict(self.source_distribution)
        self.gmr = GMR(
            n_components=self.n_components, n_iter=self.n_iter, seed=self.seed
        )
        self.gmr.fit(source_aligned, jnp.asarray(self.target_distribution))

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        self.training_traj, self.std = self.gmr.predict(self.traj_rotated, return_std=True)
        if getattr(self, "training_delta", None) is not None:
            J_gmr = self.gmr.derivative(self.traj_rotated)
            J_gamma = self.affine_transform.derivative(self.training_traj_old)
            J_phi = J_gmr @ J_gamma  # Φ = GMR ∘ γ (the GMR maps positions directly)
            self.training_delta = (J_phi @ jnp.asarray(self.training_delta)[:, :, None])[:, :, 0]

    def sample_transportation(self):
        return self.gmr.samples(self.traj_rotated)


class SVGPTransport:
    """Sparse variational GP transport with derivative posteriors
    (``torch/stocastic_variational_gaussian_process_transportation.py:12-102``)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def fit_transportation(self, num_epochs: int = 20, num_inducing: int = 100, **fit_kw):
        if not isinstance(self.target_distribution, (np.ndarray, jax.Array)) or not isinstance(
            self.source_distribution, (np.ndarray, jax.Array)
        ):
            if type(self.target_distribution) != type(self.source_distribution):
                raise TypeError("Both distributions must be arrays.")
            self.convert_distribution_to_array()  # sensor-adapter hook

        self.affine_transform = AffineTransform()
        self.affine_transform.fit(self.source_distribution, self.target_distribution)
        source_aligned = self.affine_transform.predict(self.source_distribution)
        delta = jnp.asarray(self.target_distribution) - source_aligned
        self.gp_delta_map = StochasticVariationalGaussianProcess(
            source_aligned, delta, num_inducing=num_inducing, seed=self.seed
        )
        self.gp_delta_map.fit(num_epochs=num_epochs, **fit_kw)

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.traj_rotated = self.affine_transform.predict(self.training_traj_old)
        mean, self.std = self.gp_delta_map.predict(self.traj_rotated, return_std=True)
        self.training_traj = self.traj_rotated + mean

        has_delta = getattr(self, "training_delta", None) is not None
        has_ori = getattr(self, "training_ori", None) is not None
        if has_delta or has_ori:
            J_psi, J_psi_var = self.gp_delta_map.derivative(self.traj_rotated, return_var=True)
            rot_gp = jnp.eye(J_psi.shape[-1])[None] + J_psi  # I + J_Ψ
            J_gamma = self.affine_transform.derivative(self.training_traj_old)

        if has_delta:
            v = jnp.asarray(self.training_delta)[:, :, None]
            v_rot = J_gamma @ v
            self.var_vel_transported = (J_psi_var @ v_rot**2)[:, :, 0]
            self.training_delta = (rot_gp @ v_rot)[:, :, 0]

        if has_ori:
            q_demo = jnp.asarray(self.training_ori)
            q_aff = quat.from_rotation_matrix(self.affine_transform.rotation_matrix)
            q_gp = quat.from_rotation_matrix(rot_gp)
            self.training_ori = quat.multiply(q_gp, quat.multiply(q_aff[None], q_demo))

    def sample_transportation(self):
        samples = self.gp_delta_map.samples(self.traj_rotated)
        return self.traj_rotated[None] + samples
