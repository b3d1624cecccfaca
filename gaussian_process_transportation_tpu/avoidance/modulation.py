"""Dynamical-system modulation for obstacle avoidance.

Three levels of the reference's machinery, all batched:

* ``modulation_matrix_spherical`` / ``modulation_matrix_elliptic`` —
  the closed-form single-obstacle matrices used by the 2-D examples
  (``plot_utils.py:26-41`` and ``:135-161``), vectorized over agents.
* ``modulate_multiple`` — Khansari-Zadeh 2012-style combined modulation
  M = Π_k E_k D_k E_k⁻¹ with ω-weighted eigenvalues
  (``obstacle_avoidance_Linear_DS.py:219-244``).
* ``avoid`` — the full Huber-2019 ``obs_avoidance_interpolation_moving``
  (lines 309-437): relative velocity w.r.t. moving obstacles, per-obstacle
  stretching with tangent repulsion, directional weighted averaging,
  magnitude reassembly — as ONE vmapped computation over agents.

Euler rollout (the examples' "inference loop",
``plot_utils.py:181-207``) is a ``lax.scan``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .geometry import Obstacles, modulation_bases, obstacle_weights, gamma
from .directional import directional_weighted_sum

Array = jax.Array


def modulation_matrix_spherical(state: Array, center: Array, radius: float) -> Array:
    """(N, 2, 2): M = E diag(1∓(r/d)²) Eᵀ (``plot_utils.py:26-41``)."""
    q = state - center.reshape(1, 2)
    d = jnp.linalg.norm(q, axis=1, keepdims=True)
    n = q / jnp.maximum(d, 1e-12)
    e = jnp.stack([-n[:, 1], n[:, 0]], axis=-1)
    E = jnp.stack([n, e], axis=-1)  # (N, 2, 2)
    ratio = (radius / jnp.maximum(d[:, 0], 1e-12)) ** 2
    D = jax.vmap(jnp.diag)(jnp.stack([1 - ratio, 1 + ratio], axis=-1))
    return E @ D @ jnp.swapaxes(E, 1, 2)


def modulation_matrix_elliptic(
    state: Array, center: Array, r1: float, r2: float, m: int
) -> Array:
    """(N, 2, 2): unnormalized-gradient basis with Γ = (x/r1)^m + (y/r2)^m
    (``plot_utils.py:135-161``; note the reference keeps the gradient
    unnormalized and uses E⁻¹, faithfully reproduced)."""
    q = state - center.reshape(1, 2)
    gx = (m / r1**m) * q[:, 0] ** (m - 1)
    gy = (m / r2**m) * q[:, 1] ** (m - 1)
    n = jnp.stack([gx, gy], axis=-1)  # (N, 2) unnormalized
    # e = n × ẑ → (n_y, −n_x)
    e = jnp.stack([n[:, 1], -n[:, 0]], axis=-1)
    E = jnp.stack([n, e], axis=-1)
    d = jnp.abs((q[:, 0] / r1) ** m + (q[:, 1] / r2) ** m)
    inv_d = 1.0 / jnp.maximum(d, 1e-12)
    D = jax.vmap(jnp.diag)(jnp.stack([1 - inv_d, 1 + inv_d], axis=-1))
    M = E @ D @ jnp.linalg.inv(E)
    # At the exact center the gradient vanishes and E is singular (the
    # reference NaNs there); fall back to identity.
    singular = jnp.linalg.norm(n, axis=1) < 1e-12
    return jnp.where(singular[:, None, None], jnp.eye(2)[None], M)


def modulate_multiple(obs: Obstacles, state: Array) -> Array:
    """(N, 2, 2) combined modulation M = Π_k E_k D_k E_k⁻¹ with
    λ = 1 ∓ ω_k/Γ_k (``mutiple_obstacle_modulation_matrix``, lines 219-244)."""
    E, E_ortho, gammas = modulation_bases(obs, state)  # (K,N,2,2), (K,N)
    omega = obstacle_weights(gammas)  # (K, N)
    lam1 = 1.0 - omega / gammas
    lam2 = 1.0 + omega / gammas

    def combine(E_n, lam1_n, lam2_n):
        # E_n: (K, 2, 2); multiply across obstacles in order
        def step(M, inputs):
            E_k, l1, l2 = inputs
            D_k = jnp.diag(jnp.stack([l1, l2]))
            M_k = E_k @ D_k @ jnp.linalg.inv(E_k)
            return M @ M_k, None

        M, _ = jax.lax.scan(step, jnp.eye(2), (E_n, lam1_n, lam2_n))
        return M

    return jax.vmap(combine)(
        jnp.swapaxes(E, 0, 1), lam1.T, lam2.T
    )  # vmap over agents


def _relative_obstacle_velocity(
    obs: Obstacles, x: Array, E_ortho_n: Array, gammas_n: Array, weights_n: Array
) -> Array:
    """Weighted velocity of the obstacle field at one agent position
    (``get_relative_obstacle_velocity``, lines 248-306)."""
    # angular term: ω × (x − c)
    rel = x[None, :] - obs.center  # (K, 2)
    xd_w = obs.angular_velocity[:, None] * jnp.stack([-rel[:, 1], rel[:, 0]], axis=-1)
    w_ang = jnp.exp(-(jnp.maximum(gammas_n, 1.0) - 1.0))

    lin_local0 = jnp.einsum("kd,kd->k", E_ortho_n[:, :, 0], obs.linear_velocity)
    moving_away = lin_local0 >= 0
    normal_weight_factor = 1.3
    lin_proj = (
        normal_weight_factor * lin_local0[:, None] * E_ortho_n[:, :, 0]
    )  # velocity along the outward normal
    linear_velocity = jnp.where(moving_away[:, None], lin_proj, 0.0)
    w_lin = jnp.exp(-(jnp.maximum(gammas_n, 1.0) - 1.0))

    contrib = w_lin[:, None] * linear_velocity + w_ang[:, None] * xd_w
    return jnp.sum(weights_n[:, None] * contrib, axis=0)


def avoid(
    obs: Obstacles, state: Array, velocity: Array, cut_off_gamma: float = 1e6
) -> Array:
    """Full interpolation-moving avoidance: (N, 2) modulated velocities."""
    E, E_ortho, gammas = modulation_bases(obs, state)  # (K,N,...)
    omega = obstacle_weights(gammas)
    lam1 = 1.0 - 1.0 / gammas
    lam2 = 1.0 + 1.0 / gammas

    def per_agent(x, v, E_n, Eo_n, g_n, w_n, l1_n, l2_n):
        # E_n: (K,2,2) etc.
        xd_obs = _relative_obstacle_velocity(obs, x, Eo_n, g_n, w_n)
        rel_v = v - xd_obs
        rel_norm = jnp.linalg.norm(rel_v)

        def stretched(E_k, l1, l2):
            t = jnp.linalg.solve(E_k, rel_v)
            s = jnp.stack([l1, l2]) * t
            # tangent repulsion when λ₁ < 0 (agent inside margin)
            tang_norm = jnp.linalg.norm(t[1:])
            s = s.at[0].add(jnp.where(l1 < 0, -l1 * tang_norm * 2.0, 0.0))
            return E_k @ s

        v_hat = jax.vmap(stretched)(E_n, l1_n, l2_n)  # (K, 2)
        # repulsion_coeff > 1 with inward motion keeps raw velocity
        inward = jnp.einsum("kd,d->k", Eo_n[:, :, 0], rel_v) < 0
        keep_raw = (obs.repulsion_coeff > 1.0) & inward
        v_hat = jnp.where(keep_raw[:, None], rel_v[None, :], v_hat)

        mag = jnp.linalg.norm(v_hat, axis=1)  # (K,)
        v_hat_n = jnp.where(mag[:, None] > 0, v_hat / jnp.maximum(mag, 1e-12)[:, None], 0.0)

        active = g_n < cut_off_gamma
        w_active = jnp.where(active, w_n, 0.0)

        rel_dir = rel_v / jnp.maximum(rel_norm, 1e-12)
        weighted_dir = directional_weighted_sum(rel_dir, v_hat_n.T, w_active)
        final_mag = jnp.sum(mag * w_active)
        out = final_mag * weighted_dir + xd_obs
        return jnp.where(rel_norm > 0, out, xd_obs)

    return jax.vmap(per_agent)(
        state,
        velocity,
        jnp.swapaxes(E, 0, 1),
        jnp.swapaxes(E_ortho, 0, 1),
        gammas.T,
        omega.T,
        lam1.T,
        lam2.T,
    )


def rollout(
    velocity_fn: Callable[[Array], Array],
    modulation_fn: Callable[[Array], Array],
    x0: Array,
    n_steps: int,
    dt: float = 1.0,
) -> Array:
    """Euler rollout of the modulated DS (the 2-D examples' inference loop,
    ``plot_utils.py:181-207``) as a ``lax.scan``: x ← x + M(x) f(x) dt.

    velocity_fn: (N,2)→(N,2); modulation_fn: (N,2)→(N,2,2); x0: (N,2)."""

    def step(x, _):
        M = modulation_fn(x)
        v = velocity_fn(x)
        x_new = x + (M @ v[:, :, None])[:, :, 0] * dt
        return x_new, x_new

    _, traj = jax.lax.scan(step, x0, None, length=n_steps)
    return traj  # (n_steps, N, 2)
