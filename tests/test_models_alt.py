"""Alternative delta-map models: Laplacian editing, KMP, MLP ensembles,
random forest, RealNVP flows, and the assignment op."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.ops import assignment
from gaussian_process_transportation_tpu.models import laplacian_editing as le
from gaussian_process_transportation_tpu.models import (
    KMP,
    LaplacianEditing,
    EnsembleMLP,
    EnsembleRandomForest,
    BijectiveNetwork,
    EnsembleBijectiveNetwork,
)
from gaussian_process_transportation_tpu.models import flows as flows_mod

rng = np.random.RandomState(5)


# ---------------------------------------------------------------------------
# Assignment
# ---------------------------------------------------------------------------

def test_hungarian_matches_scipy_cost():
    from scipy.optimize import linear_sum_assignment as sp_lsa

    C = rng.rand(12, 7)
    r, c = assignment.linear_sum_assignment(C)
    rs, cs = sp_lsa(C)
    assert np.isclose(C[r, c].sum(), C[rs, cs].sum())


def test_auction_assignment_near_optimal():
    from scipy.optimize import linear_sum_assignment as sp_lsa

    for seed in range(5):
        C = np.random.RandomState(seed).rand(15, 6)
        row_for_col = np.asarray(assignment.auction_assignment(jnp.asarray(C)))
        assert len(set(row_for_col.tolist())) == 6  # feasible: distinct rows
        cost = C[row_for_col, np.arange(6)].sum()
        rs, cs = sp_lsa(C)
        opt = C[rs, cs].sum()
        assert cost <= opt + 0.05 * max(opt, 1.0), (cost, opt)


# ---------------------------------------------------------------------------
# Laplacian editing
# ---------------------------------------------------------------------------

def _reference_laplacian_editing(training_traj, source, target):
    """The reference algorithm (laplacian_editing.py:44-71) in numpy."""
    import networkx as nx
    from scipy.optimize import linear_sum_assignment as sp_lsa

    n = len(training_traj)
    thr = 5 * np.max(np.linalg.norm(np.diff(training_traj, axis=0), axis=1))
    if np.linalg.norm(training_traj[0] - training_traj[-1]) < thr:
        G = nx.cycle_graph(n)
    else:
        G = nx.path_graph(n)
    L = nx.laplacian_matrix(G).toarray().astype(float)
    DELTA = L @ training_traj
    D = np.linalg.norm(training_traj[:, None] - source, axis=2)
    mt, md = sp_lsa(D)
    diff = np.zeros_like(training_traj)
    diff[mt] = target[md] - source[md]
    constraint = np.zeros_like(training_traj)
    constraint[mt] = training_traj[mt] + diff[mt]
    vect = np.zeros(n)
    vect[mt] = 1
    A = np.vstack([L, np.diag(vect)])
    B = np.vstack([DELTA, constraint])
    return (np.linalg.pinv(A) @ B)[:n]


@pytest.mark.parametrize("closed", [False, True])
def test_laplacian_editing_matches_reference(closed):
    t = np.linspace(0, 2 * np.pi if closed else 1.0, 60)
    if closed:
        traj = np.stack([np.cos(t), np.sin(t)], 1) * 10
    else:
        traj = np.stack([10 * t, 5 * np.sin(3 * t)], 1)
    source = traj[::7] + 0.1
    target = source + np.array([1.0, -2.0]) + 0.2 * rng.randn(*source.shape)

    expected = _reference_laplacian_editing(traj, source, target)
    got = np.asarray(le.edit(jnp.asarray(traj), jnp.asarray(source), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_laplacian_graph_matches_networkx():
    import networkx as nx

    for n, cyc in [(8, False), (8, True), (3, True)]:
        G = nx.cycle_graph(n) if cyc else nx.path_graph(n)
        expected = nx.laplacian_matrix(G).toarray()
        got = np.asarray(le.graph_laplacian(n, cyc))
        np.testing.assert_allclose(got, expected, atol=1e-12)


def test_laplacian_editing_moves_matched_points():
    t = np.linspace(0, 1, 40)
    traj = np.stack([t * 10, np.zeros_like(t)], 1)
    source = traj[::5]
    shift = np.array([0.0, 3.0])
    target = source + shift
    edited = np.asarray(le.edit(jnp.asarray(traj), jnp.asarray(source), jnp.asarray(target)))
    # matched waypoints should move close to the shift; interior smoothly
    moved = edited - traj
    assert np.abs(moved[:, 1] - 3.0).max() < 0.5


# ---------------------------------------------------------------------------
# KMP
# ---------------------------------------------------------------------------

def test_kmp_conditioning():
    t = np.linspace(0, 1, 80)
    traj = np.stack([10 * t, 5 * np.sin(3 * t)], 1)
    source = traj[::10]
    target = source + np.array([0.0, 2.0])

    kmp = KMP(n_restarts=0)
    kmp.mask_traj, kmp.mask_dist = kmp.find_matching_waypoints(source, traj)
    assert kmp.periodic is False
    kmp.fit(source, target, traj)
    mean, std = kmp.predict(traj, return_std=True)
    assert mean.shape == traj.shape and std.shape == traj.shape
    # conditioned trajectory should move toward the +2 shift at matched pts
    moved = np.asarray(mean) - traj
    assert moved[np.asarray(kmp.mask_traj), 1].mean() > 1.0
    s = kmp.samples(traj, n_samples=5)
    assert s.shape == (5, 80, 2)


# ---------------------------------------------------------------------------
# Ensembles
# ---------------------------------------------------------------------------

def test_ensemble_mlp_fits_and_batches():
    X = rng.randn(60, 2)
    Y = np.stack([X[:, 0] ** 2, X[:, 1] * 2], 1)
    m = EnsembleMLP(n_estimators=4, hidden=(32, 32))
    m.fit(X, Y, num_epochs=300, batch_size=32, learning_rate=3e-3)
    pred, std = m.predict(X, return_std=True)
    assert pred.shape == (60, 2) and std.shape == (60, 2)
    rmse = np.sqrt(np.mean((np.asarray(pred) - Y) ** 2))
    assert rmse < 0.6, rmse
    J, Jvar = m.derivative(X[:5], return_var=True)
    assert J.shape == (5, 2, 2) and Jvar.shape == (5, 2, 2)
    assert np.all(np.asarray(Jvar) >= 0)
    assert m.samples(X[:3]).shape == (4, 3, 2)


def test_random_forest_fit_predict():
    X = rng.rand(200, 2) * 4 - 2
    Y = np.stack([np.sign(X[:, 0]), X[:, 1] > 0.5], 1).astype(float)
    rf = EnsembleRandomForest(n_estimators=20, max_depth=5)
    rf.fit(X, Y)
    pred, std = rf.predict(X, return_std=True)
    assert pred.shape == (200, 2)
    rmse = np.sqrt(np.mean((np.asarray(pred) - Y) ** 2))
    assert rmse < 0.25, rmse
    assert np.all(np.asarray(std) >= 0)


def test_random_forest_against_sklearn_quality():
    from sklearn.ensemble import RandomForestRegressor

    X = rng.rand(150, 2)
    Y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    rf = EnsembleRandomForest(n_estimators=30, max_depth=5)
    rf.fit(X, Y[:, None])
    mine = np.asarray(rf.predict(X))[:, 0]
    sk = RandomForestRegressor(n_estimators=30, max_depth=5, random_state=0).fit(X, Y)
    sk_pred = sk.predict(X)
    # same model class ⇒ comparable training error
    assert np.mean((mine - Y) ** 2) < 2.5 * max(np.mean((sk_pred - Y) ** 2), 1e-4)


# ---------------------------------------------------------------------------
# Flows
# ---------------------------------------------------------------------------

def test_flow_identity_at_init():
    layers = flows_mod.init_flow(jax.random.PRNGKey(0), 2)
    x = jnp.asarray(rng.randn(10, 2))
    np.testing.assert_allclose(np.asarray(flows_mod.flow_forward(layers, x)), np.asarray(x), atol=1e-6)


def test_flow_invertibility():
    layers = flows_mod.init_flow(jax.random.PRNGKey(0), 2)
    # perturb so it's not identity
    layers = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
        if a.ndim >= 1 else a,
        layers,
    )
    x = jnp.asarray(rng.randn(20, 2))
    y = flows_mod.flow_forward(layers, x)
    x_rec = flows_mod.flow_inverse(layers, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_flow_jacobian_matches_finite_difference():
    layers = flows_mod.init_flow(jax.random.PRNGKey(2), 2)
    layers = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(3), a.shape), layers
    )
    x = jnp.asarray(rng.randn(6, 2))
    J = np.asarray(flows_mod.flow_jacobian(layers, x))
    eps = 1e-6
    for d in range(2):
        dx = np.zeros(2)
        dx[d] = eps
        up = np.asarray(flows_mod.flow_forward(layers, x + dx))
        dn = np.asarray(flows_mod.flow_forward(layers, x - dx))
        np.testing.assert_allclose(J[:, :, d], (up - dn) / (2 * eps), atol=1e-5)


def test_bijective_network_fits_map():
    s = np.linspace(0, 1, 40)
    src = np.stack([s * 10, np.zeros_like(s)], 1)
    tgt = np.stack([s * 10, 2 + np.sin(3 * s)], 1)
    bn = BijectiveNetwork(src, tgt, seed=0)
    bn.fit(num_epochs=600, batch_size=20, learning_rate=5e-3)
    pred = np.asarray(bn.predict(src))
    rmse = np.sqrt(np.mean((pred - tgt) ** 2))
    assert rmse < 0.35, rmse
    # inverse consistency
    rec = np.asarray(bn.inverse(jnp.asarray(pred)))
    np.testing.assert_allclose(rec, src, atol=1e-4)


def test_ensemble_flows_interface():
    s = np.linspace(0, 1, 30)
    src = np.stack([s, np.zeros_like(s)], 1)
    tgt = src + np.array([0.0, 0.5])
    m = EnsembleBijectiveNetwork(src, tgt, n_estimators=3)
    m.fit(num_epochs=100, batch_size=16)
    mean, std = m.predict(src, return_std=True)
    assert mean.shape == (30, 2) and std.shape == (30, 2)
    J, Jvar = m.derivative(src[:4], return_var=True)
    assert J.shape == (4, 2, 2) and Jvar.shape == (4, 2, 2)
    assert m.samples(src[:3]).shape == (3, 3, 2)
