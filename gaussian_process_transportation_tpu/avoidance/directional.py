"""Directional-space averaging (SO(n) weighted mean of unit directions).

Re-implements the angle-space algebra of
``obstacle_avoidance/obs_utils.py:398-476`` (``get_orthogonal_basis`` +
``UnitDirection`` + ``get_directional_weighted_sum``) as closed-form
batched math: each direction is mapped to an angle vector
a = arccos(d·n̂) · t̂ in the tangent plane of the null direction, the
weighted sum is taken there, and the result is mapped back with the
exponential map  v = cos|a| n̂ + sin|a| (B_t a/|a|).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def orthogonal_basis(vector: Array) -> Array:
    """(D, D) orthonormal basis with the (normalized) vector as column 0.

    2-D: tangent (−v₁, v₀) (reference ``get_orthogonal_basis``); 3-D: a
    Gram-Schmidt completion."""
    d = vector.shape[0]
    n = vector / jnp.maximum(jnp.linalg.norm(vector), 1e-12)
    if d == 2:
        t = jnp.stack([-n[1], n[0]])
        return jnp.stack([n, t], axis=-1)
    if d == 3:
        # pick the axis least aligned with n to seed Gram-Schmidt
        a = jnp.where(jnp.abs(n[0]) < 0.9, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
        t1 = a - jnp.dot(a, n) * n
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        t2 = jnp.cross(n, t1)
        return jnp.stack([n, t1, t2], axis=-1)
    raise NotImplementedError(f"dimension {d}")


def directional_weighted_sum(
    null_direction: Array, directions: Array, weights: Array
) -> Array:
    """Weighted directional mean relative to ``null_direction``.

    null_direction: (D,) (need not be unit); directions: (D, K) unit-ish
    columns; weights: (K,) non-negative.  Zero-weight / zero-norm columns
    are ignored (reference lines 445-453)."""
    D, K = directions.shape
    base = orthogonal_basis(null_direction)  # (D, D)
    n = base[:, 0]
    Bt = base[:, 1:]  # (D, D-1) tangent basis

    norms = jnp.linalg.norm(directions, axis=0)
    valid = (weights > 0) & (norms > 0)
    dirs = jnp.where(valid[None, :], directions / jnp.maximum(norms, 1e-12)[None, :], 0.0)
    w = jnp.where(valid, weights, 0.0)

    cos_phi = jnp.clip(dirs.T @ n, -1.0, 1.0)  # (K,)
    phi = jnp.arccos(cos_phi)
    tang = Bt.T @ dirs  # (D-1, K)
    tang_norm = jnp.linalg.norm(tang, axis=0)
    t_hat = jnp.where(tang_norm[None, :] > 1e-12, tang / jnp.maximum(tang_norm, 1e-12)[None, :], 0.0)
    angles = t_hat * phi[None, :]  # (D-1, K)

    a = angles @ w  # (D-1,)
    a_norm = jnp.linalg.norm(a)
    a_hat = jnp.where(a_norm > 1e-12, a / jnp.maximum(a_norm, 1e-12), jnp.zeros_like(a))
    v = jnp.cos(a_norm) * n + jnp.sin(a_norm) * (Bt @ a_hat)
    return v
