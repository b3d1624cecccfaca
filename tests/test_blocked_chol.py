"""Blocked Cholesky with the Pallas panel kernel (`ops/blocked_chol.py`).

CPU runs exercise the identical kernel code in interpret mode; a real-TPU
golden test lives in `scripts/bench_blocked_chol.py` (driver-run) and in
the tpu-marked test below.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_transportation_tpu.ops import blocked_chol as bc

rng = np.random.RandomState(0)


def _spd(n, dtype=np.float32):
    A = rng.randn(n, n)
    return (A @ A.T + n * np.eye(n)).astype(dtype)


@pytest.mark.parametrize("B", [128, 256])
def test_factor_panel_matches_lapack(B):
    K = _spd(B)
    L, Linv = bc.factor_panel(jnp.asarray(K), interpret=True)
    L64 = np.linalg.cholesky(K.astype(np.float64))
    Linv64 = np.linalg.inv(L64)
    assert np.abs(np.asarray(L) - L64).max() / np.abs(L64).max() < 5e-6
    assert np.abs(np.asarray(Linv) - Linv64).max() / np.abs(Linv64).max() < 5e-6
    # strictly lower-triangular outputs
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    assert np.allclose(np.triu(np.asarray(Linv), 1), 0.0)


@pytest.mark.parametrize("n,B", [(384, 128), (500, 128), (300, 256)])
def test_blocked_cholesky_matches_dense(n, B):
    K = _spd(n)
    ch = bc.blocked_cholesky(jnp.asarray(K), block=B, interpret=True)
    L64 = np.linalg.cholesky(K.astype(np.float64))
    assert np.abs(np.asarray(ch.dense()) - L64).max() / np.abs(L64).max() < 1e-5


def test_blocked_solve_and_logdet():
    n, B = 500, 128
    K = _spd(n)
    ch = bc.blocked_cholesky(jnp.asarray(K), block=B, interpret=True)
    b = rng.randn(n, 3).astype(np.float32)
    x64 = np.linalg.solve(K.astype(np.float64), b)
    x = ch.solve(jnp.asarray(b))
    assert np.abs(np.asarray(x) - x64).max() / np.abs(x64).max() < 1e-4
    # 1-D RHS round-trips shape
    x1 = ch.solve(jnp.asarray(b[:, 0]))
    assert x1.shape == (n,)
    assert np.allclose(np.asarray(x1), x64[:, 0], atol=1e-4)
    # forward-only solve
    L64 = np.linalg.cholesky(K.astype(np.float64))
    y = ch.solve_lower(jnp.asarray(b))
    y64 = np.linalg.solve(L64, b)
    assert np.abs(np.asarray(y) - y64).max() / np.abs(y64).max() < 1e-4
    # logdet excludes the padding blocks
    ld64 = np.linalg.slogdet(K.astype(np.float64))[1]
    assert abs(float(ch.logdet()) - ld64) / abs(ld64) < 1e-5


def test_gram_cholesky_solve_matches_dense_gp():
    N, D, P = 300, 3, 2
    X = rng.randn(N, D)
    Y = rng.randn(N, P)
    ls = np.array([1.5, 0.8, 1.2])
    amp, noise = 2.0, 0.1
    alpha, ch = bc.gram_cholesky_solve(
        jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        jnp.asarray(ls, jnp.float32), amp, noise, block=128, interpret=True,
    )
    D2 = (((X[:, None, :] - X[None, :, :]) / ls) ** 2).sum(-1)
    Kf = amp * np.exp(-0.5 * D2) + noise * np.eye(N)
    a64 = np.linalg.solve(Kf, Y)
    assert np.abs(np.asarray(alpha) - a64).max() / np.abs(a64).max() < 2e-4


def test_blocked_cholesky_under_jit():
    n, B = 384, 128
    K = _spd(n)
    f = jax.jit(lambda A: bc.blocked_cholesky(A, block=B, interpret=True).solve(
        jnp.ones((n,), jnp.float32)))
    x = f(jnp.asarray(K))
    x64 = np.linalg.solve(K.astype(np.float64), np.ones(n))
    assert np.allclose(np.asarray(x), x64, atol=1e-4)


@pytest.mark.tpu
def test_blocked_cholesky_on_tpu_matches_f64():
    """Real-hardware golden (runs only when a TPU backend is default)."""
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU")
    N = 2560
    X = rng.randn(N, 3).astype(np.float32)
    Y = rng.randn(N, 3).astype(np.float32)
    ls = np.ones(3, np.float32)
    alpha, _ = jax.jit(
        lambda Xs, Ys: bc.gram_cholesky_solve(
            Xs, Ys, jnp.asarray(ls), 2.0, 0.1, block=512,
            precision=jax.lax.Precision.HIGH, interpret=False)
    )(jnp.asarray(X), jnp.asarray(Y))
    X64 = X.astype(np.float64)
    sq = (X64 ** 2).sum(1)
    K64 = 2.0 * np.exp(-0.5 * np.maximum(sq[:, None] + sq[None, :] - 2 * X64 @ X64.T, 0)) + 0.1 * np.eye(N)
    a64 = np.linalg.solve(K64, Y)
    assert np.abs(np.asarray(alpha) - a64).max() / np.abs(a64).max() < 5e-3
