"""Heteroscedastic uncertainty after transport (reference
``example/2D/surface_generalization_heteroschedastic_uncertainty.py``):
transport the policy, fit an aleatoric GP on the transported velocity-std
labels, and combine with the epistemic std of the re-fit dynamics GP.

Run:  python examples/heteroscedastic_2d.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--data", default="/root/reference/example/2D/data/example.npz")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.models import exact_gp as core
    from gaussian_process_transportation_tpu.transport import heteroscedastic as het

    data = np.load(args.data)
    X = gpt.resample(jnp.asarray(data["demo"]), num_points=200)
    S = gpt.resample(jnp.asarray(data["floor"]), num_points=20)
    S1 = gpt.resample(jnp.asarray(data["newfloor"]), num_points=20)
    dX = jnp.zeros_like(X).at[:-1].set(jnp.diff(X, axis=0))

    tr = gpt.GaussianProcessTransportation(
        kernel_transport=K.Constant(10.0) * K.RBF(4.0 * jnp.ones(2)) + K.White(0.01)
    )
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj, tr.training_delta = X, dX
    tr.fit_transportation()
    tr.apply_transportation()
    X1, dX1 = tr.training_traj, tr.training_delta
    print("transported; aleatoric var range:",
          float(jnp.min(tr.var_vel_transported)), float(jnp.max(tr.var_vel_transported)))

    gp_alea = het.fit_aleatoric_gp(X1, tr.var_vel_transported, n_restarts=2)
    k_dyn = K.Constant(float(np.sqrt(0.1))) * K.Matern(jnp.ones(2), nu=2.5) + K.White(0.01)
    gp_dyn = core.fit(k_dyn, X1, dX1, n_restarts=2)

    gx = jnp.linspace(float(X1[:, 0].min()) - 10, float(X1[:, 0].max()) + 10, 40)
    gy = jnp.linspace(float(X1[:, 1].min()) - 10, float(X1[:, 1].max()) + 10, 40)
    GX, GY = jnp.meshgrid(gx, gy)
    grid = jnp.column_stack([GX.ravel(), GY.ravel()])
    mean, sig_het, sig_alea = het.heteroscedastic_field(gp_dyn, gp_alea, grid)
    print(f"combined field on 40x40 grid: σ_hetero ∈ "
          f"[{float(sig_het.min()):.3f}, {float(sig_het.max()):.3f}], "
          f"σ_aleatoric ∈ [{float(sig_alea.min()):.3f}, {float(sig_alea.max()):.3f}]")
    # aleatoric share is largest near the deformed surface (where the
    # transport Jacobian is most uncertain)
    near_surface = jnp.linalg.norm(grid[:, None, :] - jnp.asarray(S1)[None], axis=2).min(1) < 5
    print("mean σ_aleatoric near surface vs far:",
          float(sig_alea[near_surface].mean()), "vs", float(sig_alea[~near_surface].mean()))


if __name__ == "__main__":
    main()
