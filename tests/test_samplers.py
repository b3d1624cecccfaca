"""HMC/NUTS samplers: exactness on a known Gaussian, GP-posterior sanity,
sharded chains on the virtual mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.parallel import samplers
from gaussian_process_transportation_tpu.parallel.mesh import make_mesh
from gaussian_process_transportation_tpu import kernels as K

rng = np.random.RandomState(4)


def gaussian_logprob(mu, sigma):
    def lp(x):
        return -0.5 * jnp.sum(((x - mu) / sigma) ** 2)

    return lp


@pytest.mark.parametrize("alg", ["hmc", "nuts"])
def test_sampler_recovers_gaussian(alg):
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])
    sampler = samplers.hmc if alg == "hmc" else samplers.nuts
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    run = jax.jit(
        jax.vmap(
            lambda k: sampler(
                gaussian_logprob(mu, sigma),
                jnp.zeros(3),
                k,
                num_warmup=400,
                num_samples=500,
            )[0]
        )
    )
    chains = run(keys)  # (4, 500, 3)
    flat = np.asarray(chains).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(flat.std(0), np.asarray(sigma), atol=0.3)
    rhat = np.asarray(samplers.split_rhat(chains))
    assert np.all(rhat < 1.1), rhat


def test_ess_reasonable():
    # iid normal chains → ESS close to C*S
    x = jnp.asarray(rng.randn(4, 400, 2))
    ess = np.asarray(samplers.effective_sample_size(x))
    assert np.all(ess > 800), ess


@pytest.mark.slow
def test_gp_posterior_sampling_with_mesh():
    N = 25
    X = rng.randn(N, 1) * 2
    Y = np.sin(X) + 0.1 * rng.randn(N, 1)
    kernel = K.Constant(1.0, bounds=(0.01, 10.0)) * K.RBF(
        jnp.ones(1), bounds=(0.1, 10.0)
    ) + K.White(0.05, bounds=(1e-4, 1.0))
    mesh = make_mesh(n_ens=8, n_data=1)
    samples, diags = samplers.sample_gp_posterior(
        kernel,
        jnp.asarray(X),
        jnp.asarray(Y),
        jax.random.PRNGKey(0),
        num_chains=8,
        num_warmup=150,
        num_samples=150,
        mesh=mesh,
        num_leapfrog=12,
    )
    assert samples.shape == (8, 150, 3)
    theta = np.asarray(samples).reshape(-1, 3)
    bounds = np.asarray(kernel.theta_bounds)
    # samples stay within (slightly padded) bounds
    assert np.all(theta > bounds[:, 0] - 0.5)
    assert np.all(theta < bounds[:, 1] + 0.5)
    # lengthscale posterior should concentrate near a plausible value
    ls = np.exp(theta[:, 1])
    assert 0.2 < np.median(ls) < 6.0, np.median(ls)
    assert float(diags["mean_accept"].mean()) > 0.5


@pytest.mark.slow
def test_posterior_predictive_from_chains():
    """Hyperparameter-marginalized prediction: average posteriors over θ
    samples — the capability that replaces Optuna lengthscale search."""
    from gaussian_process_transportation_tpu.models import exact_gp as core

    N = 20
    X = rng.randn(N, 1)
    Y = np.cos(2 * X) + 0.05 * rng.randn(N, 1)
    kernel = K.Constant(1.0, bounds=(0.01, 10.0)) * K.RBF(jnp.ones(1), bounds=(0.1, 10.0)) + K.White(
        0.05, bounds=(1e-4, 1.0)
    )
    samples, _ = samplers.sample_gp_posterior(
        kernel, jnp.asarray(X), jnp.asarray(Y), jax.random.PRNGKey(1),
        num_chains=2, num_warmup=100, num_samples=50, num_leapfrog=8,
    )
    thetas = samples.reshape(-1, 3)[::10]  # thin
    xq = jnp.asarray(np.linspace(-2, 2, 15)[:, None])

    def predict_at(theta):
        gp = core.condition(kernel.with_theta(theta), jnp.asarray(X), jnp.asarray(Y))
        return core.predict(gp, xq)

    preds = jax.vmap(predict_at)(thetas)
    mean = np.asarray(preds.mean(0))
    truth = np.cos(2 * np.asarray(xq))
    assert np.sqrt(np.mean((mean - truth) ** 2)) < 0.35
