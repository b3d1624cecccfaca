"""3-D surface-to-surface transport on the reference's real data
(example/3D/surface_generalization_3D.py workload, subsampled for CI)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.transport.gpt import fit_and_transport
import gaussian_process_transportation_tpu as gpt


@requires_reference
def test_3d_surface_transport():
    import os

    data = np.load(os.path.join(REFERENCE_ROOT, "example/3D/data/example.npz"))
    X = jnp.asarray(data["demo"])
    S = data["old_surface"].reshape(-1, 3)
    S1 = data["new_surface"].reshape(-1, 3)
    idx = np.random.RandomState(0).choice(len(S), 500, replace=False)
    S, S1 = jnp.asarray(S[idx]), jnp.asarray(S1[idx])
    dX = jnp.zeros_like(X).at[:-1].set(jnp.diff(X, axis=0))

    kern = K.Constant(0.1) * K.RBF(jnp.asarray([1.0])) + K.White(1e-4)
    res = fit_and_transport(kern, S, S1, X, dX)
    assert res.traj.shape == X.shape
    assert bool(jnp.isfinite(res.traj).all())
    assert bool(jnp.isfinite(res.delta).all())
    assert float(res.min_abs_det) > 0  # locally diffeomorphic

    # surface points land on the target surface
    res_s = fit_and_transport(kern, S, S1, S, jnp.zeros_like(S))
    err = float(jnp.abs(res_s.traj - S1).max())
    assert err < 0.15, err

    # the demo hovers above the surface; transported demo must move with it
    moved = float(jnp.abs(res.traj - X).mean())
    assert 0.2 < moved < 2.0, moved


@requires_reference
def test_3d_orientation_transport():
    import os

    data = np.load(os.path.join(REFERENCE_ROOT, "example/3D/data/example.npz"))
    X = np.asarray(data["demo"])[::5]
    S = data["old_surface"].reshape(-1, 3)[::10]
    S1 = data["new_surface"].reshape(-1, 3)[::10]

    tr = gpt.GaussianProcessTransportation(
        kernel_transport=K.Constant(0.1) * K.RBF(jnp.asarray([1.0])) + K.White(1e-4),
        optimizer=None,
    )
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj = X
    tr.training_ori = np.tile([1.0, 0, 0, 0], (len(X), 1))
    tr.fit_transportation()
    tr.apply_transportation()
    q = np.asarray(tr.training_ori)
    assert q.shape == (len(X), 4)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-8)


def test_spiral_demo_generator():
    """Synthetic spiral workload (example/3D/spiral.py): demo is a planar
    spiral closed by a parabolic lift; surfaces are grid-aligned with the
    target sampled from a smooth GP."""
    from gaussian_process_transportation_tpu.data.datasets import spiral_demo

    demo, old_s, new_s = spiral_demo(jax.random.PRNGKey(0), n_grid=12)
    assert demo.shape[1] == 3 and old_s.shape == (12, 12, 3)
    # spiral section is planar; lift peaks at z=1 (parabola vertex)
    assert abs(demo[:360, 2]).max() == 0.0
    np.testing.assert_allclose(demo[:, 2].max(), 1.0, atol=1e-2)
    # lift connects spiral end back to its start
    np.testing.assert_allclose(demo[-1, :2], demo[0, :2], atol=1e-9)
    # surfaces share the xy grid; GP target is smooth but non-flat
    np.testing.assert_allclose(old_s[..., :2], new_s[..., :2], atol=1e-6)
    assert 1e-3 < np.abs(new_s[..., 2]).max() < 3.0
