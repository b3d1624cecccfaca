"""Heteroscedastic uncertainty composition after transport.

Parity with ``example/2D/surface_generalization_heteroschedastic_uncertainty.py:150-180``:
after transporting the policy, fit a second GP on the *aleatoric* std
labels sqrt(var_vel_transported) over the transported trajectory; at query
points, combine with the *epistemic* std of the re-fit dynamics GP:

    σ_hetero(x)² = σ_epistemic(x)² + σ_aleatoric(x)².
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import kernels as K
from ..models import exact_gp as core

Array = jax.Array


def default_uncertainty_kernel(d_out: int = 1) -> K.Kernel:
    """C(√0.1)·RBF(4, [0.01,500]) + White(0.01, [0.01,0.1])
    (reference line 152)."""
    return (
        K.Constant(float(jnp.sqrt(0.1)))
        * K.RBF(4.0 * jnp.ones(d_out), bounds=(0.01, 500.0))
        + K.White(0.01, bounds=(0.01, 0.1))
    )


def fit_aleatoric_gp(
    traj: Array,
    var_vel_transported: Array,
    kernel: Optional[K.Kernel] = None,
    n_restarts: int = 5,
    key: Optional[Array] = None,
) -> core.ExactGP:
    """GP over aleatoric std labels √var on the transported trajectory."""
    kernel = kernel if kernel is not None else default_uncertainty_kernel(traj.shape[1])
    labels = jnp.sqrt(jnp.maximum(jnp.asarray(var_vel_transported), 0.0))
    return core.fit(kernel, jnp.asarray(traj), labels, n_restarts=n_restarts, key=key)


def heteroscedastic_field(
    dynamics_gp: core.ExactGP,
    aleatoric_gp: core.ExactGP,
    query: Array,
) -> Tuple[Array, Array, Array]:
    """(velocity mean, σ_hetero per point, σ_aleatoric per point) at query.

    σ_hetero = sqrt(Σ_d [σ_epi_d² + σ_alea_d²]) — the combined field the
    reference visualizes as streamline coloring."""
    mean, std_epi = core.predict(dynamics_gp, query, return_std=True)
    std_alea = core.predict(aleatoric_gp, query)
    var = std_epi**2 + std_alea**2
    sigma_hetero = jnp.sqrt(jnp.sum(var, axis=1))
    sigma_alea = jnp.sqrt(jnp.sum(std_alea**2, axis=1))
    return mean, sigma_hetero, sigma_alea
