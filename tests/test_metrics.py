import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.utils import metrics

rng = np.random.RandomState(9)


def test_dtw_identical_zero():
    A = rng.randn(30, 2)
    assert float(metrics.dtw_distance(jnp.asarray(A), jnp.asarray(A))) < 1e-9


def test_dtw_against_bruteforce():
    """Compare with a plain O(nm) numpy DP."""
    A = rng.randn(12, 2)
    B = rng.randn(9, 2)
    D = np.linalg.norm(A[:, None] - B[None, :], axis=2)
    acc = np.full((12, 9), np.inf)
    acc[0, 0] = D[0, 0]
    for j in range(1, 9):
        acc[0, j] = D[0, j] + acc[0, j - 1]
    for i in range(1, 12):
        acc[i, 0] = D[i, 0] + acc[i - 1, 0]
        for j in range(1, 9):
            acc[i, j] = D[i, j] + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    got = float(metrics.dtw_distance(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, acc[-1, -1], rtol=1e-10)


def test_frechet_against_bruteforce():
    A = rng.randn(10, 2)
    B = rng.randn(14, 2)
    D = np.linalg.norm(A[:, None] - B[None, :], axis=2)
    acc = np.full((10, 14), np.inf)
    acc[0, 0] = D[0, 0]
    for j in range(1, 14):
        acc[0, j] = max(D[0, j], acc[0, j - 1])
    for i in range(1, 10):
        acc[i, 0] = max(D[i, 0], acc[i - 1, 0])
        for j in range(1, 14):
            acc[i, j] = max(D[i, j], min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]))
    got = float(metrics.frechet_distance(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, acc[-1, -1], rtol=1e-10)


def test_frechet_shifted_line():
    t = np.linspace(0, 1, 20)
    A = np.stack([t, np.zeros_like(t)], 1)
    B = np.stack([t, np.ones_like(t)], 1)
    np.testing.assert_allclose(
        float(metrics.frechet_distance(jnp.asarray(A), jnp.asarray(B))), 1.0, atol=1e-9
    )


def test_hausdorff_chamfer_vs_scipy():
    from scipy.spatial.distance import directed_hausdorff

    A = rng.randn(25, 3)
    B = rng.randn(18, 3)
    expected = max(
        directed_hausdorff(A, B)[0], directed_hausdorff(B, A)[0]
    )
    np.testing.assert_allclose(
        float(metrics.hausdorff_distance(jnp.asarray(A), jnp.asarray(B))), expected, rtol=1e-9
    )
    ch = float(metrics.chamfer_distance(jnp.asarray(A), jnp.asarray(B)))
    D = np.linalg.norm(A[:, None] - B[None, :], axis=2)
    np.testing.assert_allclose(ch, D.min(1).mean() + D.min(0).mean(), rtol=1e-9)


def test_area_between_parallel_lines():
    t = np.linspace(0, 1, 50)
    A = np.stack([t, np.zeros_like(t)], 1)
    B = np.stack([t, np.ones_like(t)], 1)
    area = float(metrics.area_between_curves(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(area, 1.0, atol=0.02)


def test_final_errors():
    A = np.array([[0.0, 0], [1, 0], [2, 0]])
    B = np.array([[0.0, 1], [1, 1], [2, 2]])
    np.testing.assert_allclose(float(metrics.final_position_error(jnp.asarray(A), jnp.asarray(B))), 2.0)
    ang = float(metrics.final_angle_error(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(ang, np.pi / 4, atol=1e-9)


def test_kl_zero_for_identical():
    m = rng.randn(20, 2)
    s = np.abs(rng.randn(20, 2)) + 0.1
    kl = float(metrics.gaussian_kl_divergence(*map(jnp.asarray, (m, s, m, s))))
    assert abs(kl) < 1e-9
    kl2 = float(
        metrics.gaussian_kl_divergence(
            jnp.asarray(m), jnp.asarray(s), jnp.asarray(m + 1), jnp.asarray(s)
        )
    )
    assert kl2 > 0
