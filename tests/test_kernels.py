import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.gaussian_process.kernels import (
    RBF as SkRBF,
    Matern as SkMatern,
    WhiteKernel,
    ConstantKernel as SkC,
)

from gaussian_process_transportation_tpu import kernels as K

rng = np.random.RandomState(0)
X = jnp.asarray(rng.randn(9, 3))
Z = jnp.asarray(rng.randn(6, 3))


def pairs():
    yield (
        K.Constant(10.0) * K.RBF(jnp.array([4.0, 2.0, 1.0])) + K.White(0.01),
        SkC(10.0) * SkRBF([4.0, 2.0, 1.0]) + WhiteKernel(0.01),
    )
    yield (
        K.Constant(0.1) * K.Matern(jnp.ones(3), nu=2.5) + K.White(0.01),
        SkC(0.1) * SkMatern([1.0, 1.0, 1.0], nu=2.5) + WhiteKernel(0.01),
    )
    yield (K.Matern(jnp.array(0.7), nu=1.5), SkMatern(0.7, nu=1.5))
    yield (K.Matern(jnp.array(0.7), nu=0.5), SkMatern(0.7, nu=0.5))
    yield (K.RBF(jnp.array(2.0)), SkRBF(2.0))


@pytest.mark.parametrize("idx", range(5))
def test_gram_matches_sklearn(idx):
    mine, sk = list(pairs())[idx]
    np.testing.assert_allclose(np.asarray(mine(X)), sk(np.asarray(X)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(mine(X, Z)), sk(np.asarray(X), np.asarray(Z)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(mine.diag(X)), sk.diag(np.asarray(X)), atol=1e-12)


@pytest.mark.parametrize("idx", range(5))
def test_theta_matches_sklearn(idx):
    mine, sk = list(pairs())[idx]
    np.testing.assert_allclose(np.asarray(mine.theta), sk.theta, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mine.theta_bounds), sk.bounds, atol=1e-12)
    # roundtrip
    t = mine.theta + 0.3
    np.testing.assert_allclose(np.asarray(mine.with_theta(t).theta), np.asarray(t), atol=1e-12)


@pytest.mark.parametrize(
    "kernel",
    [
        K.Constant(10.0) * K.RBF(jnp.array([4.0, 2.0, 1.0])) + K.White(0.01),
        K.Constant(0.1) * K.Matern(jnp.ones(3), nu=2.5) + K.White(0.01),
        K.Matern(jnp.array(0.7), nu=1.5),
        K.RBF(jnp.array(2.0)),
    ],
)
def test_dx_matches_jacfwd(kernel):
    """Closed-form ∂k/∂x must equal forward-mode autodiff."""

    def row(xi):
        return jax.vmap(lambda zj: kernel.pairwise(xi, zj))(Z)

    expected = jax.vmap(jax.jacfwd(row))(X)
    np.testing.assert_allclose(np.asarray(kernel.dx(X, Z)), np.asarray(expected), atol=1e-9)


@pytest.mark.parametrize(
    "kernel",
    [
        K.Constant(10.0) * K.RBF(jnp.array([4.0, 2.0, 1.0])) + K.White(0.01),
        K.RBF(jnp.array(2.0)),
    ],
)
def test_dxdz_diag_matches_autodiff(kernel):
    """Closed-form ∂²k/∂x∂z diag at x=z must equal the kernel Hessian.

    (RBF-family only: the Matérn pointwise form has a sqrt(d²+eps) guard
    whose second derivative is numerically meaningless at d=0; Matérn is
    checked against its analytic Taylor constants below.)"""

    def at_point(xi):
        H = jax.jacfwd(jax.jacrev(kernel.pairwise, argnums=0), argnums=1)(xi, xi)
        return jnp.diagonal(H)

    expected = jax.vmap(at_point)(X)
    np.testing.assert_allclose(
        np.asarray(kernel.dxdz_diag(X)), np.asarray(expected), atol=1e-9
    )


def test_matern_dxdz_diag_analytic():
    """Var[∂f/∂x_d] for Matérn: −2 g'(0)/ℓ² with g'(0) ∈ {−3/2 (ν=1.5),
    −5/6 (ν=2.5)} per the Taylor expansion of k(d) around d=0."""
    ls = jnp.array([2.0, 0.5, 1.0])
    x = jnp.asarray(rng.randn(4, 3))
    m15 = K.Matern(ls, nu=1.5)
    np.testing.assert_allclose(
        np.asarray(m15.dxdz_diag(x)),
        np.broadcast_to(3.0 / np.asarray(ls) ** 2, (4, 3)),
        atol=1e-12,
    )
    m25 = K.Constant(0.1) * K.Matern(ls, nu=2.5) + K.White(0.01)
    np.testing.assert_allclose(
        np.asarray(m25.dxdz_diag(x)),
        np.broadcast_to(0.1 * (5.0 / 3.0) / np.asarray(ls) ** 2, (4, 3)),
        atol=1e-12,
    )


def test_rbf_prior_var_over_lengthscale_identity():
    """For C·RBF+White the derivative prior variance is prior_var/ℓ²
    (the reference's hard-coded term, gaussian_process.py:98)."""
    ls = jnp.array([4.0, 2.0])
    k = K.Constant(7.0) * K.RBF(ls) + K.White(0.01)
    x = jnp.asarray(rng.randn(5, 2))
    np.testing.assert_allclose(
        np.asarray(k.dxdz_diag(x)),
        np.broadcast_to(7.0 / np.asarray(ls) ** 2, (5, 2)),
        atol=1e-12,
    )


@pytest.mark.parametrize("idx", range(5))
def test_pairwise_matches_gram(idx):
    """The pointwise (difference-based) form must agree with the
    matmul-expansion Gram for cross-covariances."""
    mine, _ = list(pairs())[idx]
    gram = np.asarray(mine(X, Z))
    pw = np.asarray(jax.vmap(lambda a: jax.vmap(lambda b: mine.pairwise(a, b))(Z))(X))
    np.testing.assert_allclose(pw, gram, atol=1e-12)


def test_kernel_is_pytree_vmappable():
    """Batched Gram over a batch of kernels — the ensemble unit."""
    base = K.Constant(1.0) * K.RBF(jnp.ones(3)) + K.White(0.01)
    thetas = base.theta[None, :] + jnp.linspace(0, 1, 4)[:, None]
    kernels = jax.vmap(base.with_theta)(thetas)
    grams = jax.vmap(lambda k: k(X))(kernels)
    assert grams.shape == (4, X.shape[0], X.shape[0])
    single = base.with_theta(thetas[2])(X)
    np.testing.assert_allclose(np.asarray(grams[2]), np.asarray(single), atol=1e-12)


def test_dxT_matches_dx_all_kernels():
    """Query-last derivative layout must equal dx transposed for every
    kernel expression used in the transport hot path."""
    import math as _math
    from gaussian_process_transportation_tpu import kernels as K

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(9, 3))
    Z = jnp.asarray(rng.randn(5, 3))
    ls = jnp.asarray([0.7, 1.3, 2.1])
    exprs = [
        K.RBF(ls),
        K.Matern(ls, nu=1.5),
        K.Matern(ls, nu=2.5),
        K.Matern(ls, nu=0.5),
        K.Matern(ls, nu=_math.inf),
        K.Constant(2.0),
        K.White(0.1),
        K.Constant(3.0) * K.RBF(ls) + K.White(0.01),
        K.RBF(ls) * K.Matern(ls, nu=2.5),
        K.Constant(0.5) * K.Matern(ls, nu=1.5) + K.White(1e-4),
    ]
    for k in exprs:
        ref = jnp.transpose(k.dx(x, Z), (2, 1, 0))
        got = k.dxT(x, Z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12)
