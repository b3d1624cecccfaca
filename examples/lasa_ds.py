"""LASA handwriting dynamical systems (the reference's paper-figure
workload, ``example/paper_figures/LASA_plot.py``): fit a GP DS to a LASA
shape and roll it out; optionally transport it onto a shifted/rotated
surface pair.

Run:  python examples/lasa_ds.py [--cpu] [--shape Angle]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--shape", default="Angle")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.models import exact_gp as core
    from gaussian_process_transportation_tpu.data.datasets import load_lasa
    from gaussian_process_transportation_tpu import viz

    demos = load_lasa(args.shape)
    X = np.concatenate([d["pos"][::10] for d in demos[:3]])
    dX = np.concatenate([d["vel"][::10] for d in demos[:3]]) * 0.01
    print(f"{args.shape}: {len(demos)} demos, using {X.shape[0]} subsampled points")

    k_dyn = K.Constant(1.0) * K.Matern(5.0 * jnp.ones(2), nu=2.5) + K.White(0.01)
    gp_dyn = core.fit(k_dyn, jnp.asarray(X), jnp.asarray(dX), n_restarts=2)

    start = jnp.asarray(demos[0]["pos"][:1])
    traj = viz.rollout_gp_ds(gp_dyn, start, n_steps=600, dt=1.0)
    end = np.asarray(traj)[-1, 0]
    goal = demos[0]["pos"][-1]
    print(f"rollout end {end.round(2)} vs demo goal {goal.round(2)} "
          f"(dist {np.linalg.norm(end-goal):.2f})")


if __name__ == "__main__":
    main()
