"""SMC particle ensembles: resampling correctness + sharded end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.parallel import smc
from gaussian_process_transportation_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(14)


def make_particles(E=64, N=10, D=2, key=0):
    trajs = jnp.asarray(rng.randn(E, N, D))
    return smc.ParticleEnsemble(
        trajectories=trajs, log_weights=jnp.zeros(E) - jnp.log(E)
    )


def test_reweight_normalizes():
    p = make_particles()
    ll = jnp.asarray(rng.randn(64))
    p2 = smc.reweight(p, ll)
    np.testing.assert_allclose(float(jnp.exp(p2.log_weights).sum()), 1.0, atol=1e-9)


def test_ess_bounds():
    p = make_particles()
    assert abs(float(smc.effective_sample_size(p)) - 64) < 1e-6  # uniform
    lw = jnp.full(64, -jnp.inf).at[3].set(0.0)
    p2 = p._replace(log_weights=lw)
    assert abs(float(smc.effective_sample_size(p2)) - 1.0) < 1e-6  # degenerate


def test_systematic_resample_statistics():
    """Resampling counts must match weights in expectation (systematic
    resampling: counts within ±1 of E·w_i)."""
    E = 1000
    trajs = jnp.arange(E, dtype=jnp.float64)[:, None, None] * jnp.ones((1, 2, 2))
    w = np.zeros(E)
    w[10] = 0.5
    w[500] = 0.3
    w[900] = 0.2
    p = smc.ParticleEnsemble(
        trajectories=trajs, log_weights=jnp.asarray(np.log(w + 1e-300))
    )
    p2 = smc.systematic_resample(p, jax.random.PRNGKey(0))
    ids = np.asarray(p2.trajectories[:, 0, 0]).astype(int)
    counts = np.bincount(ids, minlength=E)
    assert abs(counts[10] - 500) <= 1
    assert abs(counts[500] - 300) <= 1
    assert abs(counts[900] - 200) <= 1
    assert counts.sum() == E
    np.testing.assert_allclose(float(jnp.exp(p2.log_weights).sum()), 1.0, atol=1e-9)


def test_smc_end_to_end_goal_steering():
    """Posterior transport particles reweighted toward a goal: surviving
    particles end closer to the goal than the prior ensemble."""
    t = np.linspace(0, 1, 40)
    X = np.stack([10 * t, 2 * np.sin(3 * t)], 1)
    s = np.linspace(0, 1, 12)
    S = np.stack([10 * s, np.zeros_like(s)], 1)
    S1 = np.stack([10 * s, 1 + np.sin(2 * s)], 1)
    kernel = K.Constant(5.0) * K.RBF(3.0 * jnp.ones(2)) + K.White(0.05)

    mesh = make_mesh(n_ens=8, n_data=1)
    with mesh:
        particles = smc.init_particles(
            kernel, jnp.asarray(S), jnp.asarray(S1), jnp.asarray(X),
            jax.random.PRNGKey(0), n_particles=256, mesh=mesh,
        )
        assert particles.trajectories.shape == (256, 40, 2)
        prior_end = np.asarray(particles.trajectories[:, -1, :])

        goal = jnp.asarray([10.0, 2.5])
        particles2, ess = smc.smc_step(
            particles, smc.goal_likelihood(goal, scale=0.3), jax.random.PRNGKey(1),
            ess_threshold=1.0,  # force the resample so trajectories change
        )
        post_end = np.asarray(particles2.trajectories[:, -1, :])

    d_prior = np.linalg.norm(prior_end - np.asarray(goal), axis=1).mean()
    d_post = np.linalg.norm(post_end - np.asarray(goal), axis=1).mean()
    assert d_post < d_prior, (d_post, d_prior)
    assert float(ess) <= 256


def test_clearance_likelihood():
    from gaussian_process_transportation_tpu.avoidance import Obstacles, gamma

    obs = Obstacles.from_dicts(
        [{"shape": "ellipse", "center": np.array([0.0, 0.0]), "axis_length": np.array([2.0, 2.0])}]
    )
    ll_fn = smc.clearance_likelihood(lambda tr: gamma(obs, tr), margin=1.2)
    safe = jnp.asarray(np.tile([[5.0, 5.0]], (1, 10, 1)).reshape(1, 10, 2))
    unsafe = jnp.asarray(np.tile([[0.5, 0.0]], (1, 10, 1)).reshape(1, 10, 2))
    assert float(ll_fn(safe)[0]) == 0.0
    assert float(ll_fn(unsafe)[0]) < -1.0
