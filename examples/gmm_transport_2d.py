"""GMM/GMR transport of the 2-D drawing (reference
``example/comparisons/surfaces/surface_generalization_with_gmm.py:58-67``):
affine pre-align, fit a joint GMM over (γ(S), S1), map the trajectory
through the GMR conditional mean — plus analytic-Jacobian velocity
transport, which the reference demo omits.

Run:  python examples/gmm_transport_2d.py [--cpu] [--plot]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--data", default="/root/reference/example/2D/data/example.npz")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu.transport import GMRTransport

    data = np.load(args.data)
    X = gpt.resample(jnp.asarray(data["demo"]), num_points=400)
    S = gpt.resample(jnp.asarray(data["floor"]), num_points=100)
    S1 = gpt.resample(jnp.asarray(data["newfloor"]), num_points=100)
    deltaX = jnp.zeros_like(X).at[:-1].set(jnp.diff(X, axis=0))

    tr = GMRTransport(n_components=10, n_iter=100, seed=0)
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj, tr.training_delta = X, deltaX
    tr.fit_transportation()
    tr.apply_transportation()

    X1 = np.asarray(tr.training_traj)
    print(f"EM log-likelihood: {float(tr.gmr.ll_trace[0]):.2f} → "
          f"{float(tr.gmr.ll_trace[-1]):.2f}")
    print(f"mean |Φ(x) − x| = {np.mean(np.linalg.norm(X1 - np.asarray(X), axis=1)):.2f}")
    print(f"mean predictive std = {float(jnp.mean(tr.std)):.3f}")
    samples = tr.sample_transportation()
    print(f"conditional-mixture samples: {np.asarray(samples).shape}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.plot(*np.asarray(X).T, "b--", label="demo")
        ax.plot(*X1.T, "r-", label="GMR transported")
        ax.scatter(*np.asarray(S).T, c="gray", s=10, label="source")
        ax.scatter(*np.asarray(S1).T, c="k", s=10, label="target")
        ax.legend()
        fig.savefig("gmm_transport_2d.png", dpi=120)
        print("saved gmm_transport_2d.png")


if __name__ == "__main__":
    main()
