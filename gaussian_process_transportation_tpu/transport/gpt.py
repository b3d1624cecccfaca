"""Gaussian-process transportation façade + fully-jitted fast path.

``GaussianProcessTransportation`` reproduces the attribute-driven protocol of
``policy_transportation/transportation/gaussian_process_transportation.py:11-30``:
set ``.source_distribution``, ``.target_distribution``, ``.training_traj``,
optionally ``.training_delta`` / ``.training_ori``; then
``fit_transportation()`` and ``apply_transportation()`` (which updates the
attributes in place, storing ``.std`` and ``.var_vel_transported``).

``transport_apply`` is the pure functional pipeline — affine γ, GP posterior
mean/std, Jacobian mean/var, velocity/variance push-forward — as ONE jitted
function of pytrees.  This is what the benchmark and ``vmap``-ed ensemble
paths call: an ensemble of transports is a single batched computation on the
MXU instead of the reference's Python loops.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import kernels as K
from ..models import exact_gp as gp_core
from ..models.affine import AffineParams
from ..models import affine as affine_core
from ..models.gp_regressor import GaussianProcess
from ..ops import quaternion as quat
from .core import PolicyTransport

Array = jax.Array


def default_transport_kernel(d: int = 1) -> K.Kernel:
    """C(0.1)·RBF(0.1) + White(1e-4), the reference's default
    (``gaussian_process_transportation.py:12``)."""
    return K.Constant(0.1) * K.RBF(0.1 * jnp.ones(d)) + K.White(1e-4)


class GaussianProcessTransportation:
    def __init__(self, kernel_transport: Optional[K.Kernel] = None, **gp_kwargs):
        kernel = kernel_transport if kernel_transport is not None else default_transport_kernel()
        self.method = PolicyTransport(GaussianProcess(kernel=kernel, **gp_kwargs))

    def fit_transportation(self, do_scale: bool = False, do_rotation: bool = True):
        self.method.fit(
            self.source_distribution,
            self.target_distribution,
            do_scale=do_scale,
            do_rotation=do_rotation,
        )

    def apply_transportation(self):
        self.training_traj_old = jnp.asarray(self.training_traj)
        self.training_traj, self.std = self.method.transport(self.training_traj_old)
        if hasattr(self, "training_delta") and self.training_delta is not None:
            self.training_delta, self.var_vel_transported = self.method.transport_velocity(
                self.training_traj_old, self.training_delta
            )
        if hasattr(self, "training_ori") and self.training_ori is not None:
            self.training_ori = self.method.transport_orientation(
                self.training_traj_old, self.training_ori
            )

    def sample_transportation(self):
        return self.method.sample_transportation(self.training_traj_old)


# ---------------------------------------------------------------------------
# Pure functional pipeline (jit / vmap / shard_map ready)
# ---------------------------------------------------------------------------

class TransportResult(NamedTuple):
    traj: Array  # Φ(X)                      (N, D)
    std: Array  # epistemic std of Ψ∘γ       (N, D)
    delta: Array  # J_Φ · ΔX                 (N, D)
    delta_var: Array  # J_Ψvar (J_γ ΔX)²     (N, D)
    min_abs_det: Array  # diffeo diagnostic  ()


def fit_pipeline(
    kernel: K.Kernel,
    source_distribution: Array,
    target_distribution: Array,
    do_scale: bool = False,
    do_rotation: bool = True,
    jitter: float = 1e-10,
):
    """Fit γ and condition the Ψ GP (fixed hyperparameters) — jittable.

    Returns (AffineParams, ExactGP).  Hyperparameter optimization composes
    on top via models.exact_gp.fit/fit_jit on the residual dataset.
    """
    aff = affine_core.fit(
        source_distribution, target_distribution, do_scale=do_scale, do_rotation=do_rotation
    )
    src_aligned = affine_core.predict(aff, source_distribution)
    delta = target_distribution - src_aligned
    # cache K⁻¹: the transport conditions on small point sets (20–2500) and
    # queries whole trajectories — variance via MXU matmuls against K⁻¹
    # beats batched tiny triangular solves ~3× on TPU (see bench notes)
    gp = gp_core.condition(kernel, src_aligned, delta, jitter, cache_k_inv=True)
    return aff, gp


def transport_apply(
    aff: AffineParams,
    gp: gp_core.ExactGP,
    traj: Array,
    delta: Array,
) -> TransportResult:
    """The full uncertainty-aware transport of one policy — one fused graph.

    Math parity: ``policy_transportation.py:26-59``.
    """
    pos_aligned = affine_core.predict(aff, traj)
    mean, std = gp_core.predict(gp, pos_aligned, return_std=True, epistemic_only=True)
    traj_new = pos_aligned + mean

    J_gamma = affine_core.derivative(aff, traj)  # (N, D, D)
    J_psi, J_psi_var = gp_core.jacobian(gp, pos_aligned, return_var=True)
    J_phi = J_gamma + J_psi @ J_gamma
    min_abs_det = jnp.min(jnp.abs(jnp.linalg.det(J_phi)))

    v = delta[:, :, None]
    vel_aligned = J_gamma @ v
    delta_new = (J_phi @ v)[:, :, 0]
    delta_var = (J_psi_var @ vel_aligned**2)[:, :, 0]

    return TransportResult(traj_new, std, delta_new, delta_var, min_abs_det)


@partial(jax.jit, static_argnames=("do_scale", "do_rotation"))
def fit_and_transport(
    kernel: K.Kernel,
    source_distribution: Array,
    target_distribution: Array,
    traj: Array,
    delta: Array,
    do_scale: bool = False,
    do_rotation: bool = True,
    jitter: float = 1e-10,
) -> TransportResult:
    """End-to-end: γ fit + Ψ conditioning + apply, one compiled program.

    ``vmap`` over (target_distribution, ...) axes gives batched multi-target
    transport; sharding the batch axis over a mesh gives the pod-scale
    ensemble path (see ``parallel.ensemble``).
    """
    aff, gp = fit_pipeline(
        kernel,
        source_distribution,
        target_distribution,
        do_scale=do_scale,
        do_rotation=do_rotation,
        jitter=jitter,
    )
    return transport_apply(aff, gp, traj, delta)
