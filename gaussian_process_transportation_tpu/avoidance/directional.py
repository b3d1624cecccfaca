"""Directional-space algebra on the unit sphere, general n-D.

Re-implements the angle-space machinery of
``obstacle_avoidance/obs_utils.py`` as closed-form batched JAX:

* ``orthogonal_basis``        — reference ``get_orthogonal_basis`` (:398-418).
  The reference only fills the basis for D == 2 (for D ≥ 3 it returns a
  matrix with just the first column set); here D ≥ 3 uses a Householder
  completion, exact and jit/vmap-friendly for any D.
* ``angle_from_vector`` / ``vector_from_angle`` — the log/exp maps that
  ``UnitDirection.as_angle``/``as_vector`` compute (:280-297).  Angle-space
  arithmetic (``UnitDirection.__add__``/``__mul__`` etc., :188-205) is plain
  vector arithmetic on the (D−1,) angle coordinates.
* ``invert_normal``           — reference ``UnitDirection.invert_normal``
  (:218-231).  NOTE: the reference keeps the tangent direction unchanged,
  which does not round-trip through the exp map on the negated base; this
  implementation flips it (a′ = −â·(π−|a|)) so that
  ``vector_from_angle(invert_normal(a), −base) == vector_from_angle(a, base)``
  holds exactly — property-tested in ``tests/test_avoidance.py``.
* ``transform_to_base``       — reference ``UnitDirection.transform_to_base``
  (:302-346); multi-revolution windup tracking is available behind
  ``track_windup=True`` (see the function docstring for the reference's
  dead-code quirk it de-bugs).  All in-repo uses re-derive angles per step
  and take the default principal representative.
* ``directional_weighted_sum`` — reference ``get_directional_weighted_sum``
  (:420-476): weighted mean taken in the tangent (angle) space of the null
  direction, mapped back with the exponential map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def orthogonal_basis(vector: Array) -> Array:
    """(D, D) orthonormal basis with the (normalized) vector as column 0.

    D == 2 keeps the reference's tangent convention (−v₁, v₀); D ≥ 3 uses a
    Householder reflection mapping e₁ → n, which is orthonormal by
    construction for any dimension (the reference's own implementation is
    incomplete for D ≥ 3, ``obs_utils.py:412-417``).
    """
    d = vector.shape[0]
    norm = jnp.linalg.norm(vector)
    n = jnp.where(
        norm > 1e-12,
        vector / jnp.maximum(norm, 1e-12),
        jnp.zeros(d, vector.dtype).at[0].set(1.0),
    )
    if d == 1:
        return n[None, :]
    if d == 2:
        t = jnp.stack([-n[1], n[0]])
        return jnp.stack([n, t], axis=-1)
    # Householder: v = n + s·e₁ maps e₁ → −s·n under H = I − 2vvᵀ/‖v‖²;
    # scaling H by −s makes column 0 equal n while staying orthonormal.
    s = jnp.where(n[0] >= 0, 1.0, -1.0).astype(n.dtype)
    v = n.at[0].add(s)
    H = jnp.eye(d, dtype=n.dtype) - (2.0 / jnp.dot(v, v)) * jnp.outer(v, v)
    return -s * H


def angle_from_vector(direction: Array, base: Array, cos_margin: float = 1e-9) -> Array:
    """Log map: unit(ish) direction (D,) → angle coordinates (D−1,).

    a = arccos(d·n̂) · t̂ with t̂ the unit tangent coordinates of d in the
    base's tangent columns (reference ``get_angle_from_vector``)."""
    d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
    n = base[:, 0]
    Bt = base[:, 1:]
    cos_phi = jnp.clip(jnp.dot(d, n), -1.0 + cos_margin, 1.0 - cos_margin)
    phi = jnp.arccos(cos_phi)
    tang = Bt.T @ d  # (D-1,)
    tnorm = jnp.linalg.norm(tang)
    t_hat = jnp.where(tnorm > 1e-12, tang / jnp.maximum(tnorm, 1e-12), jnp.zeros_like(tang))
    return phi * t_hat


def vector_from_angle(angle: Array, base: Array) -> Array:
    """Exp map: angle coordinates (D−1,) → unit vector (D,).

    v = cos|a|·n̂ + sin|a|·B_t â (reference ``get_vector_from_angle``)."""
    n = base[:, 0]
    Bt = base[:, 1:]
    a_norm = jnp.linalg.norm(angle)
    a_hat = jnp.where(a_norm > 1e-12, angle / jnp.maximum(a_norm, 1e-12), jnp.zeros_like(angle))
    return jnp.cos(a_norm) * n + jnp.sin(a_norm) * (Bt @ a_hat)


def invert_normal(angle: Array) -> Array:
    """Angle coordinates of the same direction w.r.t. the negated base.

    |a′| = π − |a| and the tangent coordinates flip sign (the negated base
    negates its tangent columns).  Pair with ``base → −base``.  Reference
    ``UnitDirection.invert_normal`` (``obs_utils.py:218-231``) — see module
    docstring for the sign deviation."""
    a_norm = jnp.linalg.norm(angle)
    a_hat = jnp.where(a_norm > 1e-12, angle / jnp.maximum(a_norm, 1e-12), jnp.zeros_like(angle))
    scale = jnp.pi - a_norm
    # at the center (|a| = 0) the inverted representation sits at distance π
    # along an arbitrary tangent — pick the first axis like the reference
    center = jnp.zeros_like(angle).at[0].set(jnp.pi)
    return jnp.where(a_norm > 1e-12, -a_hat * scale, center)


def transform_to_base(
    angle: Array,
    old_base: Array,
    new_base: Array,
    track_windup: bool = False,
    windup_max: int = 3,
) -> Array:
    """Re-express angle coordinates w.r.t. a different base.

    Reference ``UnitDirection.transform_to_base`` (``obs_utils.py:302-346``).
    With ``track_windup=False`` (default): plain re-projection through the
    sphere — the principal representative (|a| ≤ π), which is what every
    in-repo use (per-step re-derivation) needs.

    ``track_windup=True`` implements the reference's multi-revolution
    tracking *intent*: when the rebased angle appears to have jumped across
    the ±π cut (its distance to the old normal's image exceeds the original
    |angle| by more than π/2), pick the 2π·k windup (|k| ≤ ``windup_max``)
    along the angle direction that lands closest to the old normal's image.
    Because the exp map is 2π-periodic in |a|, every windup candidate
    represents the SAME direction — only the angle-space chart changes, so
    angle paths stay continuous across the cut.  (The reference's own loop
    guards on ``not np.dot(...)`` — a float that is almost never exactly
    zero — and then scales the 2π step by that same zero dot product, so
    it never winds in practice; this is the de-bugged version of what
    ``obs_utils.py:314-345`` documents, kept behind a flag for parity.)
    """
    v = vector_from_angle(angle, old_base)
    a_new = angle_from_vector(v, new_base)
    if not track_windup:
        return a_new
    normal_img = angle_from_vector(old_base[:, 0], new_base)
    dist = jnp.linalg.norm(a_new - normal_img)
    crossed = (dist - jnp.linalg.norm(angle)) > (jnp.pi / 2)
    a_norm = jnp.linalg.norm(a_new)
    nrm = jnp.linalg.norm(normal_img)
    unit = jnp.where(
        a_norm > 1e-12,
        a_new / jnp.maximum(a_norm, 1e-12),
        normal_img / jnp.maximum(nrm, 1e-12),
    )
    ks = jnp.arange(-windup_max, windup_max + 1, dtype=a_new.dtype)
    cands = unit[None, :] * (a_norm + 2.0 * jnp.pi * ks)[:, None]  # (2W+1, D-1)
    dists = jnp.linalg.norm(cands - normal_img[None, :], axis=1)
    best = cands[jnp.argmin(dists)]
    return jnp.where(crossed, best, a_new)


def directional_weighted_sum(
    null_direction: Array, directions: Array, weights: Array
) -> Array:
    """Weighted directional mean relative to ``null_direction`` — any D.

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
    return vector_from_angle(a, base)
