"""The canonical 2-D workload (reference
``example/2D/surface_generalization.py:28-211``): load a drawn
demonstration + source/target surfaces, fit a GP dynamical system,
transport it onto the new surface, and (optionally) roll out the modulated
DS around obstacles.

Run:  python examples/surface_generalization_2d.py [--cpu] [--plot]
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
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.models import exact_gp as core
    from gaussian_process_transportation_tpu import viz
    from gaussian_process_transportation_tpu.avoidance import (
        Obstacles,
        modulate_multiple,
    )

    data = np.load(args.data)
    X = gpt.resample(jnp.asarray(data["demo"]), num_points=400)
    S = gpt.resample(jnp.asarray(data["floor"]), num_points=20)
    S1 = gpt.resample(jnp.asarray(data["newfloor"]), num_points=20)
    deltaX = jnp.zeros_like(X).at[:-1].set(jnp.diff(X, axis=0))

    # dynamics GP (reference kernel, line 49)
    k_dyn = K.Constant(float(np.sqrt(0.1))) * K.Matern(jnp.ones(2), nu=2.5) + K.White(0.01)
    gp_dyn = core.fit(k_dyn, X, deltaX, n_restarts=2)
    print("fitted dynamics lengthscales:", np.exp(np.asarray(gp_dyn.kernel.theta))[1:3])

    # transport (reference kernel, line 67)
    k_tr = K.Constant(10.0) * K.RBF(4.0 * jnp.ones(2)) + K.White(0.01)
    tr = gpt.GaussianProcessTransportation(kernel_transport=k_tr)
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj, tr.training_delta = X, deltaX
    tr.fit_transportation(do_scale=False, do_rotation=True)
    tr.apply_transportation()
    X1, deltaX1 = tr.training_traj, tr.training_delta
    print("transported; diffeomorphic:", tr.method.is_diffeomorphic)

    # refit dynamics on the transported policy
    gp_dyn1 = core.fit(k_dyn, X1, deltaX1, n_restarts=2)

    # obstacle-modulated rollout (reference lines 111-138)
    obstacles = Obstacles.from_dicts(
        [
            {"shape": "ellipse", "center": np.array([-25.0, 20.0]),
             "axis_length": np.array([5.0, 20.0]), "orientation": 30, "margin": 0.25},
            {"shape": "ellipse", "center": np.array([20.0, 30.0]),
             "reference_point": np.array([0.0, -8.5]),
             "axis_length": np.array([5.0, 20.0]), "orientation": 200, "margin": 0.25},
        ]
    )
    traj = viz.rollout_gp_ds(
        gp_dyn1, X1[:1], n_steps=300, modulation_fn=lambda x: modulate_multiple(obstacles, x)
    )
    print("rollout:", traj.shape, "end:", np.asarray(traj)[-1, 0].round(2))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ax = viz.plot_vector_field(
            gp_dyn1,
            np.linspace(float(X1[:, 0].min()) - 10, float(X1[:, 0].max()) + 10, 100),
            np.linspace(float(X1[:, 1].min()) - 10, float(X1[:, 1].max()) + 10, 100),
            demo=X1,
            surface=S1,
        )
        ax.plot(np.asarray(traj)[:, 0, 0], np.asarray(traj)[:, 0, 1], lw=3)
        plt.savefig("surface_generalization_2d.png", dpi=120)
        print("saved surface_generalization_2d.png")


if __name__ == "__main__":
    main()
