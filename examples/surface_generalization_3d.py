"""3-D surface-to-surface transport (reference
``example/3D/surface_generalization_3D.py:20-77``): a 460-point demo over a
50×50 surface; source/target distributions are the 2500-point surface
grids — the large-N exact-GP workload.

Run:  python examples/surface_generalization_3d.py [--cpu] [--subsample 900]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--data", default="/root/reference/example/3D/data/example.npz")
    p.add_argument("--subsample", type=int, default=0, help="surface points (0 = full 2500)")
    p.add_argument("--hyperopt", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.models import exact_gp as core

    data = np.load(args.data)
    X = jnp.asarray(data["demo"])
    S = data["old_surface"].reshape(-1, 3)
    S1 = data["new_surface"].reshape(-1, 3)
    if args.subsample:
        idx = np.random.RandomState(0).choice(len(S), args.subsample, replace=False)
        S, S1 = S[idx], S1[idx]
    deltaX = jnp.zeros_like(X).at[:-1].set(jnp.diff(X, axis=0))
    print(f"demo {X.shape}, distributions {S.shape}")

    # dynamics GP (reference kernel: C(√0.1)·Matern1.5 + White(0.01))
    k_dyn = K.Constant(float(np.sqrt(0.1))) * K.Matern(jnp.ones(3), nu=1.5) + K.White(0.01)
    t0 = time.time()
    gp_dyn = core.fit(k_dyn, X, deltaX, n_restarts=0 if not args.hyperopt else 2)
    print(f"dynamics GP fit ({len(X)} pts): {time.time()-t0:.1f}s")

    # transport with the reference's default kernel
    tr = gpt.GaussianProcessTransportation(
        optimizer="lbfgs" if args.hyperopt else None,
        kernel_transport=K.Constant(0.1) * K.RBF(jnp.asarray([1.0])) + K.White(1e-4),
    )
    tr.source_distribution, tr.target_distribution = jnp.asarray(S), jnp.asarray(S1)
    tr.training_traj, tr.training_delta = X, deltaX
    t0 = time.time()
    tr.fit_transportation()
    tr.apply_transportation()
    print(f"transport fit+apply (N={len(S)} Gram): {time.time()-t0:.1f}s")
    X1 = np.asarray(tr.training_traj)

    # sanity: surface points land on the new surface
    from gaussian_process_transportation_tpu.transport.gpt import fit_and_transport

    res = fit_and_transport(
        tr.method.delta_map.kernel_ if hasattr(tr.method.delta_map, "kernel_") else tr.method.delta_map.kernel,
        jnp.asarray(S), jnp.asarray(S1), jnp.asarray(S), jnp.zeros_like(jnp.asarray(S)),
    )
    err = float(jnp.abs(res.traj - jnp.asarray(S1)).max())
    print(f"Φ(S) vs S1 max err: {err:.4f}")
    print(f"demo moved (mean |Δ|): {np.abs(X1 - np.asarray(X)).mean():.4f}")
    print("diffeomorphic:", tr.method.is_diffeomorphic)

    # refit dynamics on the transported policy
    t0 = time.time()
    gp_dyn1 = core.fit(k_dyn, jnp.asarray(X1), jnp.asarray(tr.training_delta), n_restarts=0)
    print(f"re-fit dynamics: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
