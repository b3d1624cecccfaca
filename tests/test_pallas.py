"""Pallas kernels (interpret mode on CPU; same code compiles on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.ops import pallas_gram
from gaussian_process_transportation_tpu import kernels as K

rng = np.random.RandomState(12)


def test_rbf_gram_matches_reference_kernel():
    X = jnp.asarray(rng.randn(50, 2), jnp.float32)
    Z = jnp.asarray(rng.randn(37, 2), jnp.float32)
    ls = jnp.asarray([1.5, 0.7], jnp.float32)
    amp = 2.5
    got = np.asarray(pallas_gram.rbf_gram(X, Z, ls, amp, tile=16, interpret=True))
    expected = np.asarray((K.Constant(amp) * K.RBF(ls))(X, Z))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_fused_predict_mean_matches_dense():
    N, Nq, D, P = 90, 70, 2, 2
    X = jnp.asarray(rng.randn(N, D), jnp.float32)
    Xq = jnp.asarray(rng.randn(Nq, D), jnp.float32)
    alpha = jnp.asarray(rng.randn(N, P), jnp.float32)
    ls = jnp.asarray([1.0, 2.0], jnp.float32)
    amp = 3.0
    got = np.asarray(
        pallas_gram.fused_gp_predict_mean(
            Xq, X, alpha, ls, amp, tile_q=16, tile_k=32, interpret=True
        )
    )
    k = np.asarray((K.Constant(amp) * K.RBF(ls))(Xq, X))
    expected = k @ np.asarray(alpha)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_fused_predict_mean_agrees_with_exact_gp():
    """End-to-end: the fused kernel must reproduce models.exact_gp.predict."""
    from gaussian_process_transportation_tpu.models import exact_gp as core

    N, D, P = 60, 2, 2
    X = rng.randn(N, D).astype(np.float32)
    Y = np.stack([np.sin(X[:, 0]), np.cos(X[:, 1])], 1).astype(np.float32)
    Xq = rng.randn(25, D).astype(np.float32)
    kern = K.Constant(2.0) * K.RBF(jnp.asarray([1.0, 1.0])) + K.White(0.05)
    gp = core.condition(kern, jnp.asarray(X), jnp.asarray(Y))
    expected = np.asarray(core.predict(gp, jnp.asarray(Xq)))
    got = np.asarray(
        pallas_gram.fused_gp_predict_mean(
            jnp.asarray(Xq), gp.X, gp.alpha, jnp.asarray([1.0, 1.0]), 2.0,
            tile_q=16, tile_k=32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-4)


@pytest.mark.parametrize("family,nu", [("rbf", None), ("matern52", 2.5)])
def test_fused_predict_mean_var_matches_exact_gp(family, nu):
    """Fused mean+variance (VERDICT r3 #5) vs the XLA predict path, both
    K_inv-routed, on a grid workload."""
    from gaussian_process_transportation_tpu.models import exact_gp as core

    N, D, P = 60, 2, 2
    X = rng.randn(N, D).astype(np.float32)
    Y = np.stack([np.sin(X[:, 0]), np.cos(X[:, 1])], 1).astype(np.float32)
    Xq = rng.randn(41, D).astype(np.float32)
    base = K.RBF(jnp.asarray([1.0, 1.5])) if nu is None else K.Matern(
        jnp.asarray([1.0, 1.5]), nu=nu
    )
    kern = K.Constant(2.0) * base + K.White(0.05)
    gp = core.condition(kern, jnp.asarray(X), jnp.asarray(Y), cache_k_inv=True)
    mean_ref, std_ref = core.predict(gp, jnp.asarray(Xq), return_std=True)
    mean, var = pallas_gram.fused_gp_predict_mean_var(
        jnp.asarray(Xq), gp.X, gp.alpha, gp.K_inv, jnp.asarray([1.0, 1.5]),
        2.0, 2.05, tile_q=16, tile_k=32, interpret=True, family=family,
    )
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=3e-4)
    np.testing.assert_allclose(
        np.sqrt(np.asarray(var)), np.asarray(std_ref)[:, 0], atol=3e-4
    )


@pytest.mark.parametrize("family,nu", [("matern32", 1.5), ("matern52", 2.5)])
def test_fused_predict_mean_matern_matches_dense(family, nu):
    """Matern fused predict (VERDICT r2 #3): same tiling, VPU-only change."""
    N, Nq, D, P = 90, 70, 2, 2
    X = jnp.asarray(rng.randn(N, D), jnp.float32)
    Xq = jnp.asarray(rng.randn(Nq, D), jnp.float32)
    alpha = jnp.asarray(rng.randn(N, P), jnp.float32)
    ls = jnp.asarray([1.0, 2.0], jnp.float32)
    amp = 3.0
    got = np.asarray(
        pallas_gram.fused_gp_predict_mean(
            Xq, X, alpha, ls, amp, tile_q=16, tile_k=32, interpret=True,
            family=family,
        )
    )
    k = np.asarray((K.Constant(amp) * K.Matern(ls, nu=nu))(Xq, X))
    expected = k @ np.asarray(alpha)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_stationary_gram_matern_matches_kernel():
    X = jnp.asarray(rng.randn(50, 2), jnp.float32)
    Z = jnp.asarray(rng.randn(37, 2), jnp.float32)
    ls = jnp.asarray([1.5, 0.7], jnp.float32)
    amp = 2.5
    got = np.asarray(
        pallas_gram.stationary_gram(X, Z, ls, amp, tile=16, interpret=True,
                                    family="matern52")
    )
    expected = np.asarray((K.Constant(amp) * K.Matern(ls, nu=2.5))(X, Z))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_predict_routes_matern_family_params():
    """stationary_family_params recognizes the reference's canonical
    C*Matern(2.5)+White policy-DS kernel (surface_generalization.py:49)."""
    from gaussian_process_transportation_tpu.models import exact_gp as core

    kern = K.Constant(0.1) * K.Matern(jnp.asarray([0.3, 0.3]), nu=2.5) + K.White(0.0001)
    params = core.stationary_family_params(kern)
    assert params is not None
    fam, amp, ls = params
    assert fam == "matern52"
    np.testing.assert_allclose(float(amp), 0.1)
    np.testing.assert_allclose(np.asarray(ls), [0.3, 0.3])
    # RBF still reports rbf; unsupported kernels return None
    assert core.stationary_family_params(K.RBF(1.0))[0] == "rbf"
    assert core.stationary_family_params(K.RBF(1.0) * K.RBF(2.0)) is None


@pytest.mark.tpu
def test_fused_predict_routes_and_matches_on_tpu():
    """Real-hardware golden for the production fused-predict routing
    (exact_gp.predict → ops.pallas_gram.fused_gp_predict_mean on TPU at
    Nq·N ≥ 2²¹): the 100×100-grid workload (plot_utils.py:181-207) at
    N=2048 must agree with the XLA path to f32 accuracy."""
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU")
    import numpy as onp

    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.models import exact_gp as core

    rng2 = onp.random.RandomState(0)
    N, Nq = 2048, 10240
    X = jnp.asarray(rng2.randn(N, 2).astype(onp.float32))
    Y = jnp.asarray(onp.sin(onp.asarray(X)[:, :1]).astype(onp.float32))
    Xq = jnp.asarray(rng2.randn(Nq, 2).astype(onp.float32))
    kern = K.Constant(2.0) * K.RBF(jnp.ones(2, jnp.float32)) + K.White(0.01)

    gp = core.condition(kern, X, Y, jitter=1e-6)
    assert core._use_fused_predict(gp, Xq)  # heuristic must fire here
    mean_fused = core.predict(gp, Xq)

    k_star = kern(Xq, X)
    mean_xla = jnp.dot(k_star, gp.alpha, precision=jax.lax.Precision.HIGHEST)
    err = float(jnp.max(jnp.abs(mean_fused - mean_xla)))
    scale = float(jnp.max(jnp.abs(mean_xla)))
    assert err < 1e-4 * max(scale, 1.0), (err, scale)
