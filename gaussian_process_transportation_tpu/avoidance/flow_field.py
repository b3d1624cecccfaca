"""Obstacle flow-field warping (the fork-added subsystem of
``example/2D/utils.py:12-588``).

Components, re-designed as batched pure functions:

* :func:`signed_distance` / :func:`sdf_gradient` — polygon SDF with
  winding-number sign (``SDFCalculator`` :12-87), vectorized over
  (points × segments) instead of a Python loop per segment.
* :func:`radial_project` — ray casting from the obstacle center through
  each point onto the boundary (``RadialSurfaceProjector`` :90-148),
  vectorized over (points × segments).
* :func:`estimate_center_pca` — PCA center/axes via SVD (``ObstacleCenterEstimator``).
* :class:`ObstacleFlowField` — GP-learned displacement field pushing
  interior points to the boundary, with influence-limited space warp and
  Jacobian-based velocity transform (:150-297).
* polygon samplers + synthetic divergent flows (:477-587).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels as K
from ..models.gp_regressor import GaussianProcess

Array = jax.Array


# ---------------------------------------------------------------------------
# Polygon geometry
# ---------------------------------------------------------------------------

def _segments(boundary: Array) -> Tuple[Array, Array]:
    p1 = boundary
    p2 = jnp.roll(boundary, -1, axis=0)
    return p1, p2


@jax.jit
def signed_distance(boundary: Array, points: Array) -> Array:
    """(N,) signed distance to the closed polygon (negative inside)."""
    p1, p2 = _segments(boundary)  # (S, 2)
    seg = p2 - p1  # (S, 2)
    len_sq = jnp.maximum(jnp.sum(seg * seg, axis=1), 1e-30)
    rel = points[:, None, :] - p1[None, :, :]  # (N, S, 2)
    t = jnp.clip(jnp.einsum("nsd,sd->ns", rel, seg) / len_sq[None, :], 0.0, 1.0)
    proj = p1[None] + t[:, :, None] * seg[None]  # (N, S, 2)
    dists = jnp.linalg.norm(points[:, None, :] - proj, axis=2)  # (N, S)
    d = jnp.min(dists, axis=1)

    # winding number sign
    v1 = p1[None] - points[:, None, :]
    v2 = p2[None] - points[:, None, :]
    dot = jnp.sum(v1 * v2, axis=2)
    det = v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0]
    winding = jnp.sum(jnp.arctan2(det, dot), axis=1)
    inside = jnp.abs(jnp.abs(winding) - 2 * jnp.pi) < 0.1
    return d * jnp.where(inside, -1.0, 1.0)


def sdf_gradient(boundary: Array, points: Array, epsilon: float = 1e-6) -> Array:
    """Normalized central-difference SDF gradient (N, 2)."""
    grads = []
    for i in range(points.shape[1]):
        off = jnp.zeros_like(points).at[:, i].set(epsilon)
        grads.append(
            (signed_distance(boundary, points + off) - signed_distance(boundary, points - off))
            / (2 * epsilon)
        )
    g = jnp.stack(grads, axis=1)
    n = jnp.linalg.norm(g, axis=1, keepdims=True)
    return jnp.where(n > 1e-10, g / jnp.maximum(n, 1e-30), g)


@jax.jit
def radial_project(boundary: Array, points: Array, center: Array) -> Tuple[Array, Array]:
    """Project points onto the boundary along the ray center→point.

    Returns (projected (N,2), ray distance (N,)).  Falls back to the point
    itself when no segment intersects (reference :138-147)."""
    p1, p2 = _segments(boundary)
    seg = p2 - p1  # (S, 2)
    normal = jnp.stack([-seg[:, 1], seg[:, 0]], axis=1)  # (S, 2)
    vec = points - center  # (N, 2)
    ray = vec / jnp.maximum(jnp.linalg.norm(vec, axis=1, keepdims=True), 1e-10)

    denom = ray @ normal.T  # (N, S)
    t_num = (p1 - center) @ normal.T  # (S,) per segment — but normal is per segment:
    t_num = jnp.einsum("sd,sd->s", p1 - center, normal)  # (S,)
    t = t_num[None, :] / jnp.where(jnp.abs(denom) > 1e-10, denom, jnp.inf)  # (N, S)
    inter = center[None, None, :] + t[:, :, None] * ray[:, None, :]  # (N, S, 2)
    seg_t = jnp.einsum("nsd,sd->ns", inter - p1[None], seg) / jnp.maximum(
        jnp.sum(seg * seg, axis=1), 1e-30
    )[None, :]
    valid = (t > 0) & (seg_t >= 0) & (seg_t <= 1)
    t_masked = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=1)
    dist = jnp.take_along_axis(t_masked, best[:, None], axis=1)[:, 0]
    proj = jnp.take_along_axis(inter, best[:, None, None], axis=1)[:, 0, :]
    found = jnp.isfinite(dist)
    proj = jnp.where(found[:, None], proj, points)
    dist = jnp.where(found, dist, jnp.linalg.norm(vec, axis=1))
    return proj, dist


def estimate_center_pca(boundary: Array) -> Tuple[Array, Array, Array]:
    """(center, components (2,2) rows = principal axes, dimensions (2,))
    — PCA via SVD of the centered boundary."""
    b = jnp.asarray(boundary)
    center = b.mean(axis=0)
    Xc = b - center
    U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    dims = S / jnp.sqrt(b.shape[0])  # component std lengths
    return center, Vt, dims


# ---------------------------------------------------------------------------
# Flow field
# ---------------------------------------------------------------------------

class ObstacleFlowField:
    """GP displacement field pushing interior points to the boundary."""

    def __init__(
        self,
        boundary_points,
        kernel: Optional[K.Kernel] = None,
        alpha: float = 0.01,
        n_restarts: int = 2,
    ):
        self.boundary = jnp.asarray(boundary_points)
        self.center, self.components, self.dimensions = estimate_center_pca(self.boundary)
        if kernel is None:
            # hyperopt on, as the reference's GP wrapper defaults (:158),
            # but with lengthscale bounds tied to the obstacle size: the
            # displacement field flips sign across the center, and with
            # unbounded hyperopt the lengthscale collapses to ~0
            # (interpolation), killing the field's Jacobian off-data.
            r = float(jnp.max(jnp.linalg.norm(self.boundary - self.center, axis=1)))
            kernel = (
                K.Constant(25.0)
                * K.RBF(jnp.asarray(r), bounds=(r / 4.0, 10.0 * r))
                + K.White(0.01)
            )
        self.gp = GaussianProcess(kernel=kernel, alpha=alpha, n_restarts_optimizer=n_restarts)

    # reference project_using_sdf (:161-176)
    def project_using_sdf(self, points, max_iterations: int = 100, tolerance: float = 1e-6):
        points = jnp.asarray(points)

        def body(carry):
            proj, it = carry
            d = signed_distance(self.boundary, proj)
            g = sdf_gradient(self.boundary, proj)
            return proj - d[:, None] * g, it + 1

        def cond(carry):
            proj, it = carry
            d = signed_distance(self.boundary, proj)
            return jnp.logical_and(jnp.any(jnp.abs(d) >= tolerance), it < max_iterations)

        proj, _ = jax.lax.while_loop(cond, body, (points, 0))
        return proj

    def radial_projection(self, points):
        proj, _ = radial_project(self.boundary, jnp.asarray(points), self.center)
        return proj

    def learn_flow_field(self, points_inside):
        points_inside = jnp.asarray(points_inside)
        self.projected_boundary_points = self.radial_projection(points_inside)
        displacements = self.projected_boundary_points - points_inside
        self.gp.fit(points_inside, displacements)
        return self

    def max_distance(self):
        return jnp.max(jnp.linalg.norm(self.boundary - self.center, axis=1))

    def transform_space(self, points):
        """Warp points near the obstacle by the learned displacement field;
        influence limited to 2× the obstacle radius (reference :220-247)."""
        points = jnp.asarray(points)
        max_dist = self.max_distance()
        distances = jnp.linalg.norm(points - self.center, axis=1)
        mask = distances <= max_dist * 2.0
        disp, std = self.gp.predict(points, return_std=True)
        transformed = jnp.where(mask[:, None], points + disp, points)
        uncertainties = jnp.where(mask[:, None], std, 0.0)
        self.transformed_points = transformed
        return transformed, uncertainties

    def transform_velocity(self, points, velocities):
        """v ← v + s(d) · J_Ψ v with a Gaussian radial influence scaling
        (reference :283-297)."""
        points = jnp.asarray(points)
        velocities = jnp.asarray(velocities)
        J = self.gp.derivative(points)  # (N, P, D)
        max_dist = self.max_distance()
        ref_pts = getattr(self, "transformed_points", points)
        distances = jnp.linalg.norm(ref_pts - self.center, axis=1)
        near = distances <= max_dist * 2.0
        sigma = 0.5 * max_dist
        scale = jnp.exp(-1.5 * (distances / sigma) ** 2)
        delta = jnp.einsum("npd,nd->np", J, velocities)
        return jnp.where(near[:, None], velocities + scale[:, None] * delta, velocities)


# ---------------------------------------------------------------------------
# Samplers & synthetic flows
# ---------------------------------------------------------------------------

def sample_in_polygon(boundary: np.ndarray, num_samples: int, rng=None) -> np.ndarray:
    """Area-weighted triangle sampling via Delaunay (host; reference :478-506)."""
    from scipy.spatial import Delaunay

    rng = rng or np.random.RandomState(0)
    pts = np.asarray(boundary)
    tri = Delaunay(pts)
    triangles = pts[tri.simplices]
    # 2-D cross product spelled out: np.cross on 2-D inputs is removed in
    # NumPy 2.x
    e1 = triangles[:, 1] - triangles[:, 0]
    e2 = triangles[:, 2] - triangles[:, 0]
    areas = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]) / 2
    counts = rng.multinomial(num_samples, areas / areas.sum())
    out = []
    for t, n in zip(triangles, counts):
        if n == 0:
            continue
        r1, r2 = rng.random(n), rng.random(n)
        s = np.sqrt(r1)
        bary = np.column_stack([1 - s, s * (1 - r2), s * r2])
        out.append(bary @ t)
    return np.vstack(out)


def sample_in_polygon_convex(boundary: np.ndarray, num_samples: int, rng=None) -> np.ndarray:
    rng = rng or np.random.RandomState(0)
    pts = np.asarray(boundary)
    w = rng.random((num_samples, len(pts)))
    w = w / w.sum(axis=1, keepdims=True)
    return w @ pts


def divergent_rotational_flow(boundary: Array, points_inside: Array) -> Array:
    """Half-radial/half-rotational flow decaying from the center
    (reference :521-544)."""
    center, _, _ = estimate_center_pca(jnp.asarray(boundary))
    v = jnp.asarray(points_inside) - center
    d = jnp.linalg.norm(v, axis=1)
    radial = v / (d[:, None] + 1e-10)
    rot = jnp.stack([-radial[:, 1], radial[:, 0]], axis=1)
    scale = jnp.exp(-0.1 * d)[:, None]
    return (0.5 * radial + 0.5 * rot) * scale


def shaped_divergent_flow(boundary: Array, points_inside: Array) -> Array:
    """Shape-aware divergent flow weighted by the PCA axes (reference :546-587)."""
    center, components, dims = estimate_center_pca(jnp.asarray(boundary))
    v = jnp.asarray(points_inside) - center
    proj = jnp.zeros_like(v)
    scaled_d2 = jnp.zeros(v.shape[0])
    for i in range(2):
        c = components[i]
        coef = (v @ c) / dims[i]
        proj = proj + coef[:, None] * c[None, :]
        scaled_d2 = scaled_d2 + coef**2
    scaled = jnp.sqrt(scaled_d2)
    radial = proj / (jnp.linalg.norm(proj, axis=1, keepdims=True) + 1e-10)
    rot = jnp.stack([-radial[:, 1], radial[:, 0]], axis=1)
    ratio = jnp.min(dims) / jnp.max(dims)
    rw = 0.2 + 0.3 * ratio
    scale = jnp.exp(-0.5 * scaled)[:, None]
    return (rw * radial + (1 - rw) * rot) * scale
