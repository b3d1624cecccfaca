"""Quaternion algebra in JAX (scalar-first [w, x, y, z] layout).

Replaces the reference's dependency on ``numpy-quaternion``
(``policy_transportation/transportation/policy_transportation.py:61-78``),
in particular ``from_rotation_matrix(..., nonorthogonal=True)``: the
Bar-Itzhack eigenvector method, which finds the *closest* unit quaternion to
an arbitrary (possibly non-orthogonal) 3×3 matrix — exactly what the
orientation transport needs, since J_Φ = J_γ + J_Ψ J_γ is generally not a
rotation.  All functions are jit/vmap-friendly; the batched path vmaps a
4×4 symmetric eigendecomposition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product, scalar-first; broadcasts over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_rotation_matrix(R: Array) -> Array:
    """Closest unit quaternion(s) to matrix/matrices R, Bar-Itzhack (2000).

    Builds the symmetric 4×4 profile matrix K in the (x, y, z, w) basis; the
    unit eigenvector of its largest eigenvalue, reordered scalar-first, is
    the optimal quaternion.  Valid for non-orthogonal input (it solves the
    orthogonal-Procrustes problem on SO(3)).
    """
    R = jnp.asarray(R)
    batch = R.shape[:-2]
    Rf = R.reshape((-1, 3, 3))

    def one(m):
        K = jnp.array(
            [
                [
                    m[0, 0] - m[1, 1] - m[2, 2],
                    m[0, 1] + m[1, 0],
                    m[0, 2] + m[2, 0],
                    m[2, 1] - m[1, 2],
                ],
                [
                    m[0, 1] + m[1, 0],
                    m[1, 1] - m[0, 0] - m[2, 2],
                    m[1, 2] + m[2, 1],
                    m[0, 2] - m[2, 0],
                ],
                [
                    m[0, 2] + m[2, 0],
                    m[1, 2] + m[2, 1],
                    m[2, 2] - m[0, 0] - m[1, 1],
                    m[1, 0] - m[0, 1],
                ],
                [
                    m[2, 1] - m[1, 2],
                    m[0, 2] - m[2, 0],
                    m[1, 0] - m[0, 1],
                    m[0, 0] + m[1, 1] + m[2, 2],
                ],
            ]
        ) / 3.0
        _, vecs = jnp.linalg.eigh(K)
        v = vecs[:, -1]  # largest eigenvalue (eigh sorts ascending)
        q = jnp.array([v[3], v[0], v[1], v[2]])
        # canonical sign: non-negative scalar part
        return q * jnp.where(q[0] < 0, -1.0, 1.0)

    q = jax.vmap(one)(Rf)
    return q.reshape(batch + (4,))


def to_rotation_matrix(q: Array) -> Array:
    """Unit quaternion(s) → rotation matrix/matrices."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)
