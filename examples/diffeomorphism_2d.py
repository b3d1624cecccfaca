"""Diffeomorphism checking + lengthscale optimization (reference
``example/2D/surface_generalization_with_diffeomorphism_optimization.py:1-80``,
``transportation/gaussian_process_transportation_diffeomorphic.py:109-167``,
and the grid-deformation visualization of ``example/2D/plot_diffeomorphism.py``):
fit the transport, fit the *inverse* transport, measure the forward∘inverse
residual, and sweep the RBF max-lengthscale bound to minimize it.

Run:  python examples/diffeomorphism_2d.py [--cpu] [--plot]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--data", default="/root/reference/example/2D/data/example.npz")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu.transport.diffeo import (
        GaussianProcessTransportationDiffeo,
    )

    data = np.load(args.data)
    X = gpt.resample(jnp.asarray(data["demo"]), num_points=200)
    S = gpt.resample(jnp.asarray(data["floor"]), num_points=20)
    S1 = gpt.resample(jnp.asarray(data["newfloor"]), num_points=20)

    tr = GaussianProcessTransportationDiffeo()
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj = X
    tr.fit_transportation()
    residual = tr.check_invertibility()
    print(f"forward∘inverse residual (default kernel): {residual:.4f}")

    best_ls = tr.optimize_diffeomorphism(n_trials=args.trials)
    print(f"optimized max-lengthscale bound: {best_ls:.2f} "
          f"(residual {tr.diffeo_errors[best_ls]:.4f})")
    tr.apply_transportation()
    X1 = np.asarray(tr.training_traj)
    print(f"transported traj: mean |Δ| = "
          f"{np.mean(np.linalg.norm(X1 - np.asarray(X), axis=1)):.2f}, "
          f"diffeomorphic: {bool(tr.method.is_diffeomorphic)}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # grid deformation (plot_diffeomorphism.py): push a regular grid
        # through Φ and draw the warped grid lines
        lo = np.asarray(X).min(0) - 10
        hi = np.asarray(X).max(0) + 10
        gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 25), np.linspace(lo[1], hi[1], 25))
        grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1))
        warped, _ = tr.method.transport(grid)
        W = np.asarray(warped).reshape(25, 25, 2)

        fig, ax = plt.subplots(figsize=(8, 6))
        for i in range(25):
            ax.plot(W[i, :, 0], W[i, :, 1], "gray", lw=0.5)
            ax.plot(W[:, i, 0], W[:, i, 1], "gray", lw=0.5)
        ax.plot(*X1.T, "r-", lw=2, label="transported demo")
        ax.scatter(*np.asarray(S1).T, c="k", s=12, label="target")
        ax.legend()
        fig.savefig("diffeomorphism_2d.png", dpi=120)
        print("saved diffeomorphism_2d.png")


if __name__ == "__main__":
    main()
