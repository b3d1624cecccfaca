"""Obstacle flow-field subsystem (example/2D/utils.py parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.avoidance import flow_field as ff

rng = np.random.RandomState(1)


def circle_boundary(n=40, r=2.0, center=(0.0, 0.0)):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([center[0] + r * np.cos(t), center[1] + r * np.sin(t)], 1)


def test_signed_distance_circle():
    b = jnp.asarray(circle_boundary(200, r=2.0))
    pts = jnp.asarray([[3.0, 0.0], [0.0, 0.5], [0.0, -4.0], [1.99, 0.0]])
    d = np.asarray(ff.signed_distance(b, pts))
    np.testing.assert_allclose(d, [1.0, -1.5, 2.0, -0.01], atol=0.01)


def test_sdf_gradient_points_outward():
    b = jnp.asarray(circle_boundary(200, r=2.0))
    pts = jnp.asarray([[3.0, 0.0], [0.0, 5.0]])
    g = np.asarray(ff.sdf_gradient(b, pts))
    np.testing.assert_allclose(g, [[1.0, 0.0], [0.0, 1.0]], atol=1e-3)


def test_radial_projection_circle():
    b = jnp.asarray(circle_boundary(400, r=2.0))
    center = jnp.zeros(2)
    pts = jnp.asarray([[0.5, 0.0], [0.0, 1.0], [1.0, 1.0]])
    proj, dist = ff.radial_project(b, pts, center)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(proj), axis=1), 2.0, atol=0.01)
    # projection preserves direction
    dirs = np.asarray(pts) / np.linalg.norm(np.asarray(pts), axis=1, keepdims=True)
    pdirs = np.asarray(proj) / np.linalg.norm(np.asarray(proj), axis=1, keepdims=True)
    np.testing.assert_allclose(pdirs, dirs, atol=0.01)


def test_estimate_center_pca_ellipse():
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    b = np.stack([3 + 4 * np.cos(t), 1 + 1.5 * np.sin(t)], 1)
    center, comps, dims = ff.estimate_center_pca(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(center), [3.0, 1.0], atol=1e-6)
    # principal axis along x
    assert abs(np.asarray(comps)[0, 0]) > 0.99
    assert np.asarray(dims)[0] > np.asarray(dims)[1]


def test_flow_field_pushes_interior_to_boundary():
    b = circle_boundary(60, r=2.0)
    field = ff.ObstacleFlowField(b)
    inside = ff.sample_in_polygon_convex(b, 150, rng)
    field.learn_flow_field(inside)
    warped, unc = field.transform_space(jnp.asarray(inside))
    r_out = np.linalg.norm(np.asarray(warped), axis=1)
    # interior points moved close to the boundary radius
    assert np.median(np.abs(r_out - 2.0)) < 0.35, np.median(np.abs(r_out - 2.0))
    # far points untouched
    far = jnp.asarray([[10.0, 10.0]])
    w2, _ = field.transform_space(far)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(far), atol=1e-9)


def test_transform_velocity_finite_and_scaled():
    b = circle_boundary(60, r=2.0)
    field = ff.ObstacleFlowField(b)
    inside = ff.sample_in_polygon_convex(b, 100, rng)
    field.learn_flow_field(inside)
    pts = jnp.asarray([[0.5, 0.5], [8.0, 8.0]])
    v = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    # (no transform_space first: influence is then evaluated at the raw
    # points, keeping the near point inside the influence radius)
    v2 = np.asarray(field.transform_velocity(pts, v))
    assert np.isfinite(v2).all()
    np.testing.assert_allclose(v2[1], [1.0, 0.0], atol=1e-9)  # far: unchanged
    # near: warped — the Gaussian influence is evaluated at the TRANSFORMED
    # location (on the boundary), so the correction is small but nonzero
    assert not np.allclose(v2[0], [1.0, 0.0], atol=1e-8), v2[0]


def test_polygon_samplers_inside():
    b = circle_boundary(30, r=2.0)
    for sampler in (ff.sample_in_polygon, ff.sample_in_polygon_convex):
        s = sampler(b, 200, np.random.RandomState(0))
        r = np.linalg.norm(s, axis=1)
        assert (r < 2.01).mean() > 0.99


def test_divergent_flows_point_outward():
    b = circle_boundary(30, r=2.0)
    pts = ff.sample_in_polygon_convex(b, 100, np.random.RandomState(2))
    for flow_fn in (ff.divergent_rotational_flow, ff.shaped_divergent_flow):
        v = np.asarray(flow_fn(jnp.asarray(b), jnp.asarray(pts)))
        radial = np.sum(v * (pts / np.linalg.norm(pts, axis=1, keepdims=True)), axis=1)
        assert (radial > 0).mean() > 0.9  # mostly outward
        assert np.isfinite(v).all()
