"""All transport variants run the same 2D workload end-to-end and must
(1) satisfy the attribute protocol, (2) move the trajectory toward the
target surface, (3) transport velocities consistently with their own
position transport (FD check)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.transport import (
    AffineTransportation,
    KMPTransport,
    LaplacianEditingTransport,
    MLPTransport,
    RandomForestTransport,
    NeuralTransport,
    EnsembleNeuralTransport,
    BijectiveTransport,
    EnsembleBijectiveTransport,
    SVGPTransport,
    finite_difference_jacobian,
)

rng = np.random.RandomState(11)


def make_problem(n_traj=60, n_dist=12):
    t = np.linspace(0, 1, n_traj)
    X = np.stack([10 * t, 3 + 2 * np.sin(3 * t)], axis=1)
    deltaX = np.zeros_like(X)
    deltaX[:-1] = np.diff(X, axis=0)
    s = np.linspace(0, 1, n_dist)
    S = np.stack([10 * s, np.zeros_like(s)], axis=1)
    S1 = np.stack([10 * s, 2 + np.sin(2 * s)], axis=1)
    return X, deltaX, S, S1


def run_variant(tr, fit_kwargs=None, with_delta=True):
    X, deltaX, S, S1 = make_problem()
    tr.source_distribution = S
    tr.target_distribution = S1
    tr.training_traj = X
    if with_delta:
        tr.training_delta = deltaX
    tr.fit_transportation(**(fit_kwargs or {}))
    tr.apply_transportation()
    return X, deltaX, S, S1, tr


VARIANTS = [
    ("affine", lambda: AffineTransportation(), {}),
    ("kmp", lambda: KMPTransport(), {}),
    ("laplacian", lambda: LaplacianEditingTransport(), {}),
    ("mlp", lambda: MLPTransport(n_estimators=3), {}),
    ("rf", lambda: RandomForestTransport(n_estimators=10, max_depth=4), {}),
    ("neural", lambda: NeuralTransport(hidden=(64, 64)), {"num_epochs": 300}),
    ("enn", lambda: EnsembleNeuralTransport(n_estimators=3), {"num_epochs": 300}),
    ("flow", lambda: BijectiveTransport(), {"num_epochs": 400}),
    ("eflow", lambda: EnsembleBijectiveTransport(n_estimators=3), {"num_epochs": 300}),
    ("svgp", lambda: SVGPTransport(), {"num_epochs": 150, "num_inducing": 12}),
]


@pytest.mark.parametrize("name,make,kw", VARIANTS, ids=[v[0] for v in VARIANTS])
def test_variant_protocol_and_shapes(name, make, kw):
    X, deltaX, S, S1, tr = run_variant(make(), kw)
    traj = np.asarray(tr.training_traj)
    assert traj.shape == X.shape
    assert np.all(np.isfinite(traj))
    assert np.asarray(tr.std).shape == X.shape
    assert np.asarray(tr.training_delta).shape == deltaX.shape
    assert np.all(np.isfinite(np.asarray(tr.training_delta)))
    samples = np.asarray(tr.sample_transportation())
    assert samples.shape[1:] == X.shape


@pytest.mark.parametrize(
    "name,make,kw",
    [v for v in VARIANTS if v[0] in ("kmp", "laplacian", "mlp", "svgp", "flow")],
    ids=["kmp", "laplacian", "mlp", "svgp", "flow"],
)
def test_variant_moves_toward_target(name, make, kw):
    """The demo rides ~3 units above the source surface; after transport it
    should ride above the target surface (y up by ~2 on average)."""
    X, deltaX, S, S1, tr = run_variant(make(), kw)
    shift = np.asarray(tr.training_traj)[:, 1].mean() - X[:, 1].mean()
    assert 1.0 < shift < 4.0, shift


def test_finite_difference_jacobian_identity():
    X, deltaX, _, _ = make_problem()
    J = finite_difference_jacobian(jnp.asarray(X), jnp.asarray(X))
    # Phi=identity: J @ dX must reproduce dX (pinv of rank-1 steps is exact
    # only along the step direction — deltas ARE the step directions here)
    v = (J[:-1] @ jnp.asarray(deltaX)[:-1, :, None])[:, :, 0]
    np.testing.assert_allclose(np.asarray(v), deltaX[:-1], atol=1e-8)


def test_svgp_transport_orientation_3d():
    n = 40
    t = np.linspace(0, 1, n)
    X = np.stack([10 * t, np.sin(3 * t), t], axis=1)
    s = np.linspace(0, 1, 10)
    S = np.stack([10 * s, np.zeros_like(s), np.zeros_like(s)], axis=1)
    S1 = S + np.array([0.0, 1.5, 0.5])
    tr = SVGPTransport()
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj = X
    tr.training_ori = np.tile([1.0, 0, 0, 0], (n, 1))
    tr.fit_transportation(num_epochs=100, num_inducing=10)
    tr.apply_transportation()
    q = np.asarray(tr.training_ori)
    assert q.shape == (n, 4)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-6)


def test_affine_pure_translation_exact():
    X, deltaX, S, _ = make_problem()
    S1 = S + np.array([2.0, -1.0])
    tr = AffineTransportation()
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj = X
    tr.training_delta = deltaX
    tr.fit_transportation()
    tr.apply_transportation()
    np.testing.assert_allclose(
        np.asarray(tr.training_traj), X + np.array([2.0, -1.0]), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(tr.training_delta), deltaX, atol=1e-6)
