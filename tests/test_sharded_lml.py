"""Distributed panel-LML goldens (parallel/sharded_lml.py).

Run on the 8-device virtual CPU mesh (conftest); the single-device panel
LML (ops/blocked_lml.py, itself golden-tested against dense f64 autodiff)
is the equality reference, so these tests pin the DISTRIBUTION logic:
block-cyclic T columns, trace accumulation over block pairs, psum
reductions.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from gaussian_process_transportation_tpu.ops.blocked_lml import (
    blocked_lml_value_and_grad,
)
from gaussian_process_transportation_tpu.parallel.sharded_lml import (
    fit_sharded,
    make_sharded_lml,
    sharded_lml_value_and_grad,
)
from gaussian_process_transportation_tpu import kernels as K

_HI = jax.lax.Precision.HIGHEST


def _mesh(D):
    return Mesh(np.array(jax.devices("cpu")[:D]), ("data",))


def _problem(n=350, nd=3, p=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, nd)).astype(np.float32)
    Y = (np.sin(2.0 * X[:, :1]) + 0.1 * rng.standard_normal((n, p))).astype(
        np.float32
    )
    return jnp.asarray(X), jnp.asarray(Y)


# interpret-mode pallas × D virtual devices is minutes-scale on the 2-core
# box: keep one (D=2, rbf) combination in the fast tier, the rest slow
@pytest.mark.parametrize(
    "D",
    [2, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)],
)
@pytest.mark.parametrize(
    "family",
    ["rbf", pytest.param("matern52", marks=pytest.mark.slow)],
)
def test_sharded_lml_matches_single_device(D, family):
    X, Y = _problem()
    log_amp = jnp.asarray(0.3, jnp.float32)
    log_ls = jnp.log(jnp.asarray([1.2, 0.8, 1.5], jnp.float32))
    log_noise = jnp.asarray(math.log(0.05), jnp.float32)

    val_s, (ga_s, gl_s, gn_s) = sharded_lml_value_and_grad(
        X, Y, family, log_amp, log_ls, log_noise,
        mesh=_mesh(D), block=128, jitter=1e-6, precision=_HI, interpret=True,
    )
    val_1, (ga_1, gl_1, gn_1) = blocked_lml_value_and_grad(
        X, Y, family, log_amp, log_ls, log_noise,
        jitter=1e-6, block=128, precision=_HI, interpret=True,
        refine_iters=0,
    )
    assert np.allclose(float(val_s), float(val_1), rtol=1e-5), (val_s, val_1)
    scale = max(abs(float(ga_1)), np.abs(np.asarray(gl_1)).max(),
                abs(float(gn_1)))
    assert abs(float(ga_s) - float(ga_1)) < 1e-4 * scale
    np.testing.assert_allclose(np.asarray(gl_s), np.asarray(gl_1),
                               atol=1e-4 * scale)
    assert abs(float(gn_s) - float(gn_1)) < 1e-4 * scale


def test_sharded_lml_custom_vjp_and_isotropic():
    X, Y = _problem(n=300, nd=2, p=1, seed=1)
    mesh = _mesh(4)
    lml = make_sharded_lml("rbf", mesh, block=128, jitter=1e-6,
                           interpret=True)
    theta = {
        "log_amp": jnp.asarray(0.1, jnp.float32),
        "log_ls": jnp.asarray(0.2, jnp.float32),  # isotropic scalar
        "log_noise": jnp.asarray(math.log(0.1), jnp.float32),
    }
    v, g = jax.value_and_grad(lml)(theta, X, Y)
    theta_ard = dict(theta, log_ls=jnp.full((2,), 0.2, jnp.float32))
    v2, (ga, gl, gn) = sharded_lml_value_and_grad(
        X, Y, "rbf", theta_ard["log_amp"], theta_ard["log_ls"],
        theta_ard["log_noise"], mesh=mesh, block=128, jitter=1e-6,
        interpret=True,
    )
    assert np.allclose(float(v), float(v2), rtol=1e-6)
    assert g["log_ls"].shape == ()
    assert np.allclose(float(g["log_ls"]), float(jnp.sum(gl)), rtol=1e-5)
    assert np.allclose(float(g["log_amp"]), float(ga), rtol=1e-5, atol=1e-7)
    assert np.allclose(float(g["log_noise"]), float(gn), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_lml_witness_n8192_memory_accounting():
    """N=8192 witness on the full 8-device mesh (VERDICT r3 #10): the
    configuration class behind the README's 'v5e-8 holds N≈100k' claim,
    executed — block=512 → 16 block-cyclic panels, 2 per device — with the
    per-device panel-memory accounting printed and balance asserted.
    Equality vs the single-device panel LML pins the distribution logic at
    this scale."""
    n, nd, block, n_dev = 8192, 3, 512, 8
    rng = np.random.default_rng(8)
    X = jnp.asarray(rng.standard_normal((n, nd)).astype(np.float32))
    Y = jnp.asarray(
        (np.sin(2.0 * np.asarray(X)[:, :1])
         + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    )
    log_amp = jnp.asarray(0.3, jnp.float32)
    log_ls = jnp.zeros(nd, jnp.float32)
    log_noise = jnp.asarray(math.log(0.1), jnp.float32)

    val_s, (ga_s, gl_s, gn_s) = sharded_lml_value_and_grad(
        X, Y, "rbf", log_amp, log_ls, log_noise,
        mesh=_mesh(n_dev), block=block, jitter=1e-6, precision=_HI,
        interpret=True,
    )
    val_1, (ga_1, gl_1, gn_1) = blocked_lml_value_and_grad(
        X, Y, "rbf", log_amp, log_ls, log_noise,
        jitter=1e-6, block=block, precision=_HI, interpret=True,
        refine_iters=0,
    )
    assert np.allclose(float(val_s), float(val_1), rtol=1e-5), (val_s, val_1)
    scale = max(abs(float(ga_1)), np.abs(np.asarray(gl_1)).max(),
                abs(float(gn_1)))
    assert abs(float(ga_s) - float(ga_1)) < 1e-4 * scale
    np.testing.assert_allclose(np.asarray(gl_s), np.asarray(gl_1),
                               atol=1e-4 * scale)
    assert abs(float(gn_s) - float(gn_1)) < 1e-4 * scale

    # per-device panel memory, block-cyclic ownership (device d owns panels
    # d, d+n_dev, ...): panel k holds (Np - k*B, B) f32
    Np = -(-n // block) * block
    P = Np // block
    per_dev = [
        sum((Np - k * block) * block * 4 for k in range(d, P, n_dev))
        for d in range(n_dev)
    ]
    total = sum(per_dev)
    print("\nper-device panel bytes:",
          [f"{b/2**20:.1f}MiB" for b in per_dev],
          f"total {total/2**20:.1f}MiB")
    assert total == sum((Np - k * block) * block * 4 for k in range(P))
    # block-cyclic balance: worst device within 2x of the mean
    assert max(per_dev) < 2.0 * total / n_dev
    # the claim's arithmetic, from the same accounting at N=100k on 8 chips:
    # ~0.5*N^2*4/8 = 2.5 GB/chip of panels -- comfortably inside v5e HBM
    n_claim = 100_000
    Np_c = -(-n_claim // block) * block
    P_c = Np_c // block
    worst = max(
        sum((Np_c - k * block) * block * 4 for k in range(d, P_c, n_dev))
        for d in range(n_dev)
    )
    print(f"extrapolated worst-chip panel memory at N=100k: {worst/2**30:.2f} GiB")
    assert worst < 4 * 2**30  # < 4 GiB of 16 GiB v5e HBM


@pytest.mark.slow
def test_fit_sharded_improves_lml():
    from gaussian_process_transportation_tpu.models import exact_gp

    rng = np.random.default_rng(5)
    n, nd = 280, 2
    X = rng.uniform(-2.0, 2.0, (n, nd)).astype(np.float32)
    f = np.sin(1.5 * X[:, :1]) * np.cos(0.7 * X[:, 1:2])
    Y = (f + 0.05 * rng.standard_normal((n, 1))).astype(np.float32)
    kernel = (
        K.Constant(1.0, bounds=(1e-3, 1e3))
        * K.RBF(jnp.ones(nd, jnp.float32), bounds=(1e-2, 1e2))
        + K.White(0.5, bounds=(1e-6, 1e1))
    )
    fitted, theta, vals = fit_sharded(
        kernel, jnp.asarray(X), jnp.asarray(Y), mesh=_mesh(4),
        maxiter=15, block=128, interpret=True,
    )
    lml0 = float(exact_gp.log_marginal_likelihood(kernel, X, Y, 1e-6))
    lml1 = float(exact_gp.log_marginal_likelihood(fitted, X, Y, 1e-6))
    assert lml1 > lml0 + 1.0, (lml0, lml1)
    assert np.isfinite(np.asarray(vals)).all()
