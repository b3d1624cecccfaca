"""Goldens for the panel-form LML gradients (ops/blocked_lml.py).

Everything runs the real panel algorithms in Pallas interpret mode on CPU
and is checked against dense f64 linear algebra / autodiff — the same
strategy as tests/test_blocked_chol.py.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.models import exact_gp
from gaussian_process_transportation_tpu.ops.blocked_chol import (
    blocked_cholesky,
    stationary_from_sqdist,
)
from gaussian_process_transportation_tpu.ops.blocked_lml import (
    blocked_lml_value_and_grad,
    kinv_panels,
    make_blocked_lml,
    tri_inverse_panels,
)

_HI = jax.lax.Precision.HIGHEST


def _spd(n, rng, noise=0.5):
    A = rng.standard_normal((n, n)).astype(np.float32)
    return (A @ A.T / n + noise * np.eye(n)).astype(np.float32)


def _assemble_lower(cols, n, B):
    """Dense lower-triangular matrix from column panels (padding sliced)."""
    Np = cols[0].shape[0]
    M = np.zeros((Np, Np), np.float64)
    for s, c in enumerate(cols):
        M[s * B :, s * B : (s + 1) * B] = np.asarray(c, np.float64)
    return M[:n, :n]


def _assemble_symmetric(cols, n, B):
    """Dense symmetric matrix from lower column panels (diag blocks full)."""
    Np = cols[0].shape[0]
    P = Np // B
    M = np.zeros((Np, Np), np.float64)
    for s in range(P):
        for i in range(s, P):
            blk = np.asarray(cols[s][(i - s) * B : (i - s + 1) * B], np.float64)
            M[i * B : (i + 1) * B, s * B : (s + 1) * B] = blk
            if i > s:
                M[s * B : (s + 1) * B, i * B : (i + 1) * B] = blk.T
    return M[:n, :n]


def test_tri_inverse_panels_golden():
    rng = np.random.default_rng(0)
    n, B = 300, 128  # padding exercised: Np = 384
    Kd = _spd(n, rng)
    ch = blocked_cholesky(jnp.asarray(Kd), block=B, interpret=True)
    T = _assemble_lower(tri_inverse_panels(ch), n, B)
    L64 = np.linalg.cholesky(Kd.astype(np.float64))
    ref = np.linalg.inv(L64)
    err = np.abs(T - ref).max() / np.abs(ref).max()
    assert err < 5e-5, err


def test_kinv_panels_golden():
    rng = np.random.default_rng(1)
    n, B = 300, 128
    Kd = _spd(n, rng)
    ch = blocked_cholesky(jnp.asarray(Kd), block=B, interpret=True)
    Ki = _assemble_symmetric(kinv_panels(ch), n, B)
    ref = np.linalg.inv(Kd.astype(np.float64))
    err = np.abs(Ki - ref).max() / np.abs(ref).max()
    assert err < 5e-5, err


def _dense_lml_f64(theta, X64, Y64, family, jitter):
    """Dense f64 LML of amp·k(d²/ℓ²) + (σ²+jitter)I — autodiff reference."""
    amp = jnp.exp(theta["log_amp"])
    ls = jnp.exp(theta["log_ls"])
    noise = jnp.exp(theta["log_noise"])
    Z = X64 / ls
    d2 = jnp.sum((Z[:, None, :] - Z[None, :, :]) ** 2, axis=-1)
    Km = amp * stationary_from_sqdist(d2, family) + (noise + jitter) * jnp.eye(
        X64.shape[0], dtype=X64.dtype
    )
    L = jnp.linalg.cholesky(Km)
    alpha = jax.scipy.linalg.cho_solve((L, True), Y64)
    n, p = Y64.shape
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return (
        -0.5 * jnp.sum(Y64 * alpha)
        - p * (0.5 * logdet + 0.5 * n * math.log(2.0 * math.pi))
    )


@pytest.mark.parametrize("family", ["rbf", "matern32", "matern52"])
def test_blocked_lml_value_and_grad_matches_dense_autodiff(family):
    rng = np.random.default_rng(2)
    n, D = 300, 3
    X = rng.standard_normal((n, D)).astype(np.float32)
    Y = (np.sin(2.0 * X[:, :1]) + 0.1 * rng.standard_normal((n, 2))).astype(
        np.float32
    )
    theta = {
        "log_amp": jnp.asarray(0.3, jnp.float64),
        "log_ls": jnp.log(jnp.asarray([1.2, 0.8, 1.5], jnp.float64)),
        "log_noise": jnp.asarray(math.log(0.05), jnp.float64),
    }
    jitter = 1e-6

    ref_val, ref_grad = jax.value_and_grad(
        lambda t: _dense_lml_f64(
            t, jnp.asarray(X, jnp.float64), jnp.asarray(Y, jnp.float64),
            family, jitter,
        )
    )(theta)

    val, (g_amp, g_ls, g_noise) = blocked_lml_value_and_grad(
        jnp.asarray(X), jnp.asarray(Y), family,
        theta["log_amp"].astype(jnp.float32),
        theta["log_ls"].astype(jnp.float32),
        theta["log_noise"].astype(jnp.float32),
        jitter=jitter, block=128, precision=_HI, interpret=True,
    )
    assert abs(float(val) - float(ref_val)) < 2e-3 * abs(float(ref_val)) + 1e-2
    scale = max(
        np.abs(np.asarray(ref_grad["log_ls"])).max(),
        abs(float(ref_grad["log_amp"])),
        abs(float(ref_grad["log_noise"])),
    )
    assert abs(float(g_amp) - float(ref_grad["log_amp"])) < 2e-3 * scale
    np.testing.assert_allclose(
        np.asarray(g_ls), np.asarray(ref_grad["log_ls"]), atol=2e-3 * scale
    )
    assert abs(float(g_noise) - float(ref_grad["log_noise"])) < 2e-3 * scale


def test_custom_vjp_matches_value_and_grad():
    rng = np.random.default_rng(3)
    n, D = 260, 2
    X = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    theta = {
        "log_amp": jnp.asarray(0.1, jnp.float32),
        "log_ls": jnp.zeros((D,), jnp.float32),
        "log_noise": jnp.asarray(math.log(0.1), jnp.float32),
    }
    lml = make_blocked_lml("rbf", jitter=1e-6, block=128, interpret=True)
    v1, g1 = jax.value_and_grad(lml)(theta, X, Y)
    v2, (ga, gl, gn) = blocked_lml_value_and_grad(
        X, Y, "rbf", theta["log_amp"], theta["log_ls"], theta["log_noise"],
        jitter=1e-6, block=128, interpret=True,
    )
    assert np.allclose(float(v1), float(v2), rtol=1e-6)
    assert np.allclose(float(g1["log_amp"]), float(ga), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1["log_ls"]), np.asarray(gl),
                               rtol=1e-5, atol=1e-6)
    assert np.allclose(float(g1["log_noise"]), float(gn), rtol=1e-5, atol=1e-6)


def test_isotropic_lengthscale_grad_sums():
    rng = np.random.default_rng(4)
    n, D = 200, 3
    X = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    lml = make_blocked_lml("rbf", jitter=1e-6, block=128, interpret=True)
    t_iso = {
        "log_amp": jnp.asarray(0.0, jnp.float32),
        "log_ls": jnp.asarray(0.2, jnp.float32),  # scalar, shared over D
        "log_noise": jnp.asarray(math.log(0.1), jnp.float32),
    }
    g_iso = jax.grad(lml)(t_iso, X, Y)
    t_ard = dict(t_iso, log_ls=jnp.full((D,), 0.2, jnp.float32))
    g_ard = jax.grad(lml)(t_ard, X, Y)
    assert g_iso["log_ls"].shape == ()
    assert np.allclose(
        float(g_iso["log_ls"]), float(jnp.sum(g_ard["log_ls"])), rtol=1e-5
    )


@pytest.mark.tpu
def test_blocked_lml_grad_on_tpu_matches_f64():
    """Real-hardware golden: the HIGH-precision (bf16x3 TRSM/SYRK) panel
    LML value and gradient at N=4096 must match the host f64 dense
    autodiff reference within the f32 conditioning limit."""
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU")
    rng = np.random.default_rng(7)
    n, D = 4096, 3
    X = rng.standard_normal((n, D)).astype(np.float32)
    Y = (np.sin(2.0 * X[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(
        np.float32
    )
    jitter = 1e-6
    # Dense f64 numpy reference on the host (x64 is off in the tpu test
    # tier, so no jax f64 here).  Uses the textbook trace identity — the
    # identity itself is validated against dense autodiff in the CPU tier
    # (test_blocked_lml_value_and_grad_matches_dense_autodiff); this golden
    # checks the HARDWARE numerics of the panel pipeline against exact f64.
    from scipy.linalg import cho_solve as _cho_solve

    amp, ls_v, noise = 2.0, np.array([1.0, 1.2, 0.9]), 0.1
    Z64 = X.astype(np.float64) / ls_v
    d2 = np.zeros((n, n))
    for d in range(D):
        diff = Z64[:, d, None] - Z64[None, :, d]
        d2 += diff * diff
    Kf = amp * np.exp(-0.5 * d2)
    K64 = Kf + (noise + jitter) * np.eye(n)
    L64 = np.linalg.cholesky(K64)
    Y64 = Y.astype(np.float64)
    alpha64 = _cho_solve((L64, True), Y64)
    p = Y64.shape[1]
    ref_val = float(
        -0.5 * np.sum(Y64 * alpha64)
        - p * (np.sum(np.log(np.diag(L64))) + 0.5 * n * math.log(2 * math.pi))
    )
    Kinv64 = _cho_solve((L64, True), np.eye(n))
    W = 0.5 * (alpha64 @ alpha64.T - p * Kinv64)
    g_ls_ref = np.zeros(D)
    for d in range(D):
        diff = Z64[:, d, None] - Z64[None, :, d]
        # rbf: amp·k'(d²) = −½·Kf;  ∂d²/∂log ℓ_d = −2·diff²
        g_ls_ref[d] = np.sum(W * (-0.5 * Kf) * (-2.0 * diff * diff))
    ref_grad = {
        "log_amp": np.sum(W * Kf),
        "log_ls": g_ls_ref,
        "log_noise": noise * np.trace(W),
    }

    theta32 = {
        "log_amp": jnp.asarray(math.log(2.0), jnp.float32),
        "log_ls": jnp.log(jnp.asarray([1.0, 1.2, 0.9], jnp.float32)),
        "log_noise": jnp.asarray(math.log(0.1), jnp.float32),
    }
    val, (g_amp, g_ls, g_noise) = jax.jit(
        lambda Xs, Ys, t: blocked_lml_value_and_grad(
            Xs, Ys, "rbf", t["log_amp"], t["log_ls"], t["log_noise"],
            jitter=jitter, block=512,
            precision=jax.lax.Precision.HIGH, interpret=False,
        )
    )(jnp.asarray(X), jnp.asarray(Y), theta32)
    assert abs(float(val) - float(ref_val)) < 5e-3 * abs(float(ref_val))
    scale = max(
        np.abs(np.asarray(ref_grad["log_ls"])).max(),
        abs(float(ref_grad["log_amp"])),
        abs(float(ref_grad["log_noise"])),
    )
    assert abs(float(g_amp) - float(ref_grad["log_amp"])) < 1e-2 * scale
    np.testing.assert_allclose(
        np.asarray(g_ls), np.asarray(ref_grad["log_ls"]), atol=1e-2 * scale
    )
    assert abs(float(g_noise) - float(ref_grad["log_noise"])) < 1e-2 * scale


def test_fit_blocked_improves_and_matches_scipy_fit():
    rng = np.random.default_rng(5)
    n, D = 256, 2
    X = rng.uniform(-2.0, 2.0, (n, D)).astype(np.float32)
    f = np.sin(1.5 * X[:, :1]) * np.cos(0.7 * X[:, 1:2])
    Y = (f + 0.05 * rng.standard_normal((n, 1))).astype(np.float32)

    kernel = (
        K.Constant(1.0, bounds=(1e-3, 1e3))
        * K.RBF(jnp.ones(D, jnp.float32), bounds=(1e-2, 1e2))
        + K.White(0.5, bounds=(1e-6, 1e1))
    )
    gp = exact_gp.fit_blocked(
        kernel, jnp.asarray(X), jnp.asarray(Y), maxiter=25, block=128,
        interpret=True,
    )
    # fitted state is a working posterior (panel form, no dense L)
    assert gp.chol is not None and gp.L is None
    mean = exact_gp.predict(gp, jnp.asarray(X[:16]))
    assert np.isfinite(np.asarray(mean)).all()

    lml0 = float(exact_gp.log_marginal_likelihood(kernel, X, Y, 1e-6))
    lml1 = float(exact_gp.log_marginal_likelihood(gp.kernel, X, Y, 1e-6))
    assert lml1 > lml0 + 1.0, (lml0, lml1)

    # parity with the sklearn-semantics scipy fit on the same start
    gp_ref = exact_gp.fit(kernel, X, Y, n_restarts=0, jitter=1e-6)
    lml_ref = float(exact_gp.log_marginal_likelihood(gp_ref.kernel, X, Y, 1e-6))
    assert lml1 >= lml_ref - 0.02 * abs(lml_ref) - 2.0, (lml1, lml_ref)
