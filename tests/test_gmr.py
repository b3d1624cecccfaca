"""GMR model: jitted EM quality, conditional-mixture regression vs a
brute-force numpy implementation, analytic Jacobian vs ``jax.jacfwd``,
sampling moments, and the ``GMRTransport`` pipeline.

Reference workload: ``example/comparisons/surfaces/surface_generalization_with_gmm.py:58-67``
(sklearn-style ``GMM(n_components=10).fit(source, target)`` then conditional
mean over the trajectory).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.models import GMR
from gaussian_process_transportation_tpu.models.gmr import (
    fit_gmm,
    condition_on_x,
    gmr_predict,
    gmr_derivative,
)
from gaussian_process_transportation_tpu.transport import GMRTransport

rng = np.random.RandomState(11)


def _toy_joint(n=400):
    """Smooth nonlinear map on a curve: x on an arc, y = f(x) + small noise."""
    t = np.linspace(0, 1, n)
    x = np.stack([np.cos(2.4 * t), np.sin(2.4 * t) + 0.3 * t], axis=1)
    y = np.stack([x[:, 0] + 0.5 * x[:, 1] ** 2, np.sin(3 * x[:, 0])], axis=1)
    y += 0.01 * rng.randn(n, 2)
    return x, y


def test_em_loglik_monotone_and_improves():
    x, y = _toy_joint()
    z = jnp.asarray(np.concatenate([x, y], axis=1))
    params, ll = fit_gmm(z, jax.random.PRNGKey(0), n_components=8, n_iter=60)
    ll = np.asarray(ll)
    # EM guarantees non-decreasing marginal likelihood (tiny float slack).
    assert np.all(np.diff(ll) > -1e-8)
    assert ll[-1] > ll[0] + 1.0
    # Weights normalized, covariances SPD.
    assert np.isclose(np.exp(np.asarray(params.log_weights)).sum(), 1.0, atol=1e-9)
    evals = np.linalg.eigvalsh(np.asarray(params.covs))
    assert np.all(evals > 0)


def _brute_force_gmr(params, dx, xq):
    """Numpy GMR conditional mean/var, straight from the textbook formulas."""
    w = np.exp(np.asarray(params.log_weights))
    mu = np.asarray(params.means)
    S = np.asarray(params.covs)
    K = w.shape[0]
    N = xq.shape[0]
    dy = mu.shape[1] - dx
    from scipy.stats import multivariate_normal

    comp = np.zeros((K, N))
    m = np.zeros((K, N, dy))
    cvar = np.zeros((K, dy))
    for k in range(K):
        sxx = S[k, :dx, :dx]
        sxy = S[k, :dx, dx:]
        syy = S[k, dx:, dx:]
        comp[k] = w[k] * multivariate_normal.pdf(xq, mu[k, :dx], sxx)
        gain = (np.linalg.solve(sxx, sxy)).T
        m[k] = mu[k, dx:] + (xq - mu[k, :dx]) @ gain.T
        cvar[k] = np.diag(syy - gain @ sxy)
    r = comp / comp.sum(axis=0, keepdims=True)
    mean = np.einsum("kn,kny->ny", r, m)
    second = np.einsum("kn,kny->ny", r, cvar[:, None, :] + m**2)
    return mean, np.maximum(second - mean**2, 0.0), r


def test_gmr_predict_matches_brute_force():
    x, y = _toy_joint()
    z = jnp.asarray(np.concatenate([x, y], axis=1))
    params, _ = fit_gmm(z, jax.random.PRNGKey(1), n_components=6, n_iter=50)
    cp = condition_on_x(params, 2)
    xq = jnp.asarray(x[::7] + 0.03)
    mean, var = gmr_predict(cp, xq)
    mean_np, var_np, _ = _brute_force_gmr(params, 2, np.asarray(xq))
    np.testing.assert_allclose(np.asarray(mean), mean_np, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), var_np, rtol=1e-7, atol=1e-12)


def test_gmr_derivative_matches_jacfwd():
    x, y = _toy_joint()
    z = jnp.asarray(np.concatenate([x, y], axis=1))
    params, _ = fit_gmm(z, jax.random.PRNGKey(2), n_components=5, n_iter=40)
    cp = condition_on_x(params, 2)
    xq = jnp.asarray(x[::29])
    J = gmr_derivative(cp, xq)

    def mean_at(pt):
        return gmr_predict(cp, pt[None, :])[0][0]

    J_ad = jax.vmap(jax.jacfwd(mean_at))(xq)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=1e-7, atol=1e-9)


def test_gmr_fit_quality_and_samples():
    x, y = _toy_joint()
    model = GMR(n_components=10, n_iter=120, seed=3).fit(x, y)
    pred, std = model.predict(x, return_std=True)
    err = np.sqrt(np.mean((np.asarray(pred) - y) ** 2))
    assert err < 0.08, err
    assert np.all(np.asarray(std) >= 0)
    draws = model.samples(x[:50], n_samples=4000)
    assert draws.shape == (4000, 50, 2)
    emp_mean = np.mean(np.asarray(draws), axis=0)
    np.testing.assert_allclose(
        emp_mean, np.asarray(model.predict(x[:50])), atol=0.05
    )
    emp_std = np.std(np.asarray(draws), axis=0)
    np.testing.assert_allclose(emp_std, np.asarray(std[:50]), atol=0.05)


def test_gmr_transport_on_drawing():
    """End-to-end GMRTransport on synthetic 2-D surface data: the mapped
    trajectory must land near the target surface the way the reference's
    GMM demo does, and the Jacobian-based velocity transport must agree
    with finite differences of the position map."""
    t = np.linspace(0, 1, 120)
    src = np.stack([t * 10, np.sin(2 * t)], axis=1)
    tgt = np.stack([t * 10, np.sin(2 * t) + 2.0 + 1.5 * t], axis=1)
    traj = np.stack([t * 10, np.sin(2 * t) + 1.0], axis=1)
    delta = np.diff(traj, axis=0, append=traj[-1:])

    tr = GMRTransport(n_components=8, n_iter=80, seed=0)
    tr.source_distribution = src
    tr.target_distribution = tgt
    tr.training_traj = traj
    tr.training_delta = delta
    tr.fit_transportation()
    tr.apply_transportation()

    new_traj = np.asarray(tr.training_traj)
    assert new_traj.shape == traj.shape
    # Mapped trajectory should sit roughly one unit above the target curve's
    # offset pattern — check it moved up by ≥1 on average and tracks x.
    assert np.mean(new_traj[:, 1] - traj[:, 1]) > 0.5
    np.testing.assert_allclose(new_traj[:, 0], traj[:, 0], atol=1.5)
    # Velocity transport: J_Φ v ≈ finite difference of mapped positions.
    new_delta = np.asarray(tr.training_delta)
    fd = np.diff(new_traj, axis=0)
    cos = np.sum(new_delta[:-1] * fd, axis=1) / (
        np.linalg.norm(new_delta[:-1], axis=1) * np.linalg.norm(fd, axis=1) + 1e-12
    )
    assert np.mean(cos) > 0.95
    samples = np.asarray(tr.sample_transportation())
    assert samples.ndim == 3 and samples.shape[1:] == traj.shape
