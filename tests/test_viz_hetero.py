"""Vector-field/rollout compute + heteroscedastic uncertainty composition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.models import exact_gp as core
from gaussian_process_transportation_tpu import viz
from gaussian_process_transportation_tpu.transport import heteroscedastic as het

rng = np.random.RandomState(17)


@pytest.fixture(scope="module")
def linear_ds_gp():
    """GP fit to the linear DS ẋ = −0.1 x (exactly learnable)."""
    X = rng.uniform(-5, 5, (80, 2))
    dX = -0.1 * X
    k = K.Constant(1.0) * K.RBF(3.0 * jnp.ones(2)) + K.White(1e-4)
    return core.condition(k, jnp.asarray(X), jnp.asarray(dX))


def test_vector_field_shapes_and_values(linear_ds_gp):
    u, v, std = viz.vector_field(linear_ds_gp, jnp.linspace(-3, 3, 10), jnp.linspace(-3, 3, 12))
    assert u.shape == (12, 10) and v.shape == (12, 10) and std.shape == (12, 10, 2)
    # at (3, 3) grid corner the field should be ≈ (−0.3, −0.3)
    np.testing.assert_allclose(float(u[-1, -1]), -0.3, atol=0.05)
    np.testing.assert_allclose(float(v[-1, -1]), -0.3, atol=0.05)


def test_rollout_converges_to_origin(linear_ds_gp):
    traj = viz.rollout_gp_ds(linear_ds_gp, jnp.asarray([[4.0, -4.0]]), n_steps=300, dt=1.0)
    end = np.asarray(traj)[-1, 0]
    assert np.linalg.norm(end) < 0.5, end


def test_min_variance_attractor_points_to_data(linear_ds_gp):
    """The variance-descent field must point toward the training data."""
    q = jnp.asarray([[8.0, 8.0]])  # outside the data support
    v = np.asarray(viz.min_variance_attractor_field(linear_ds_gp, q))
    # direction should have negative components (toward the data around 0)
    assert v[0, 0] < 0 and v[0, 1] < 0


def test_rollout_stable_and_traj_evolution_3d():
    """plot_utils.py:298-325 parity: the stabilized rollout converges into
    the data support (the −std·∇σ²/‖∇σ²‖ term attracts toward the demo) and
    the 3D plot helpers draw it."""
    rng3 = np.random.RandomState(3)
    X = rng3.uniform(-4, 4, (60, 3))
    dX = -0.1 * X
    k = K.Constant(1.0) * K.RBF(3.0 * jnp.ones(3)) + K.White(1e-4)
    gp = core.condition(k, jnp.asarray(X), jnp.asarray(dX))

    traj = viz.rollout_stable_gp_ds(gp, jnp.asarray([[6.0, -6.0, 6.0]]), n_steps=150)
    assert traj.shape == (150, 1, 3)
    end = np.asarray(traj)[-1, 0]
    # far outside the support the variance-descent dominates and pulls in
    assert np.linalg.norm(end) < np.linalg.norm([6.0, -6.0, 6.0])
    assert np.isfinite(np.asarray(traj)).all()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = np.linspace(-4, 4, 5)
    gx, gy = np.meshgrid(g, g)
    surface = np.stack([gx, gy, 0.1 * gx * gy], axis=-1)
    ax = viz.plot_traj_evolution(
        gp, g, g, g, demo=X, surface=surface, n_steps=20,
        key=jax.random.PRNGKey(1),
    )
    assert ax is not None
    plt.close("all")


def test_heteroscedastic_composition():
    t = np.linspace(0, 1, 60)
    X1 = np.stack([10 * t, np.sin(3 * t)], 1)
    dX1 = np.zeros_like(X1)
    dX1[:-1] = np.diff(X1, axis=0)
    var_vel = 0.01 + 0.2 * t[:, None] ** 2 * np.ones((1, 2))  # grows along traj

    gp_dyn = core.fit(
        K.Constant(np.sqrt(0.1)) * K.Matern(jnp.ones(2), nu=2.5) + K.White(0.01),
        jnp.asarray(X1), jnp.asarray(dX1), n_restarts=0,
    )
    gp_alea = het.fit_aleatoric_gp(jnp.asarray(X1), jnp.asarray(var_vel), n_restarts=0)

    mean, sig_het, sig_alea = het.heteroscedastic_field(gp_dyn, gp_alea, jnp.asarray(X1))
    assert mean.shape == X1.shape
    assert np.all(np.asarray(sig_het) >= np.asarray(sig_alea) - 1e-9)
    # aleatoric label structure recovered: grows along the trajectory
    s = np.asarray(sig_alea)
    assert s[-5:].mean() > s[:5].mean()


def test_draw_error_band_smoke():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    t = np.linspace(0, 2 * np.pi, 50)
    viz.draw_error_band(ax, np.cos(t), np.sin(t), 0.1 * np.ones(50), facecolor="orange")
    assert len(ax.patches) == 1
    plt.close(fig)
