"""Model-agnostic policy transportation: Φ(x) = γ(x) + Ψ(γ(x)).

Parity with ``policy_transportation/transportation/policy_transportation.py:11-84``:

* ``fit``       — Kabsch affine γ on (S, S1), then fit the delta map Ψ on
                  (γ(S), S1 − γ(S)).
* ``transport`` — positions through Φ with predictive std.
* ``transport_velocity`` — push-forward through J_Φ = J_γ + J_Ψ J_γ with
                  per-entry Jacobian variance: var = J_Ψvar (J_γ v)².
* ``transport_orientation`` — quaternion of the (generally non-orthogonal)
                  J_Φ composed with the demo quaternion (3-D only).
* ``sample_transportation`` — posterior function samples through Φ.

The delta map Ψ is duck-typed (``fit/predict/derivative/samples``), so every
model family in :mod:`..models` plugs in.  The diffeomorphism check is
returned as a diagnostic instead of printed.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from ..models import affine as affine_core
from ..ops import quaternion as quat


class PolicyTransport:
    def __init__(self, delta_model: Any):
        self.delta_map = delta_model
        self.affine: affine_core.AffineParams | None = None
        self.is_diffeomorphic: bool | None = None

    def fit(self, source_distribution, target_distribution, do_scale=False, do_rotation=True):
        source_distribution = jnp.asarray(source_distribution)
        target_distribution = jnp.asarray(target_distribution)
        self.affine = affine_core.fit(
            source_distribution,
            target_distribution,
            do_scale=do_scale,
            do_rotation=do_rotation,
        )
        source_aligned = affine_core.predict(self.affine, source_distribution)
        self.delta_distribution = target_distribution - source_aligned
        self.delta_map.fit(source_aligned, self.delta_distribution)
        return self

    def transport(self, pos, return_std: bool = True):
        pos_aligned = affine_core.predict(self.affine, jnp.asarray(pos))
        if return_std:
            mean, std = self.delta_map.predict(pos_aligned, return_std=True)
            return pos_aligned + mean, std
        mean = self.delta_map.predict(pos_aligned)
        return pos_aligned + mean, None

    def _jacobian_phi(self, pos, return_var: bool):
        pos = jnp.asarray(pos)
        pos_aligned = affine_core.predict(self.affine, pos)
        J_gamma = affine_core.derivative(self.affine, pos)  # (N, D, D)
        if return_var:
            J_psi, J_psi_var = self.delta_map.derivative(pos_aligned, return_var=True)
        else:
            J_psi = self.delta_map.derivative(pos_aligned, return_var=False)
            J_psi_var = None
        J_phi = J_gamma + J_psi @ J_gamma
        self.is_diffeomorphic = bool(
            jnp.all(jnp.abs(jnp.linalg.det(J_phi)) > 0)
        )
        return J_gamma, J_phi, J_psi_var

    def transport_velocity(self, pos, vel, return_var: bool = True):
        J_gamma, J_phi, J_psi_var = self._jacobian_phi(pos, return_var)
        v = jnp.asarray(vel)[:, :, None]
        vel_aligned = J_gamma @ v
        vel_transported = (J_phi @ v)[:, :, 0]
        if not return_var:
            return vel_transported, None
        var = (J_psi_var @ vel_aligned**2)[:, :, 0]
        return vel_transported, var

    def transport_orientation(self, pos, ori):
        _, J_phi, _ = self._jacobian_phi(pos, return_var=False)
        if J_phi.shape[-1] != 3:
            raise ValueError(
                f"Orientation transport requires a 3-D map; J_Φ is "
                f"{J_phi.shape[-2:]} (reference prints a warning and skips: "
                f"policy_transportation.py:75-77)"
            )
        q_demo = jnp.asarray(ori)  # (N, 4) scalar-first
        q_phi = quat.from_rotation_matrix(J_phi)
        return quat.multiply(q_phi, q_demo)

    def sample_transportation(self, pos):
        pos_aligned = affine_core.predict(self.affine, jnp.asarray(pos))
        delta_samples = self.delta_map.samples(pos_aligned)
        return pos_aligned[None] + delta_samples
