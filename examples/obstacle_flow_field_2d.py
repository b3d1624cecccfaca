"""Obstacle flow-field warping of a transported policy (reference
``example/2D/surface_generalization_with_obstacle.py:118-396`` +
``example/2D/utils.py:151-298``): sample points inside a polygonal
obstacle, radially project them to the boundary, learn a GP displacement
field, and warp a trajectory (positions via the field, velocities via its
Jacobian with radial influence scaling).

Run:  python examples/obstacle_flow_field_2d.py [--cpu] [--plot]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussian_process_transportation_tpu.avoidance.flow_field import (
        ObstacleFlowField,
        sample_in_polygon,
        signed_distance,
    )

    # polygonal obstacle (an ellipse-ish blob, reference builds from drawing)
    th = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    boundary = np.stack(
        [5.0 + 2.0 * np.cos(th), 0.0 + 1.2 * np.sin(th) + 0.3 * np.sin(2 * th)],
        axis=1,
    )

    rng = np.random.RandomState(0)
    inside = sample_in_polygon(boundary, 200, rng=rng)
    print(f"sampled {inside.shape[0]} interior points")

    field = ObstacleFlowField(boundary).learn_flow_field(inside)

    # a straight trajectory crossing the obstacle
    t = np.linspace(0, 1, 150)
    traj = np.stack([10 * t, 0.2 * np.ones_like(t)], axis=1)
    vel = np.gradient(traj, axis=0)

    warped, unc = field.transform_space(jnp.asarray(traj))
    warped = np.asarray(warped)
    new_vel = np.asarray(field.transform_velocity(jnp.asarray(traj), jnp.asarray(vel)))

    d_before = np.asarray(signed_distance(jnp.asarray(boundary), jnp.asarray(traj)))
    d_after = np.asarray(signed_distance(jnp.asarray(boundary), jnp.asarray(warped)))
    was_inside = d_before < 0
    depth_before = -d_before[was_inside].mean()
    depth_after = float(np.maximum(-d_after[was_inside], 0.0).mean())
    print(f"interior traj points: {was_inside.sum()}; mean depth "
          f"{depth_before:.3f} → {depth_after:.3f} after warp (→0 = on boundary)")
    print(f"max displacement: {np.abs(warped - traj).max():.3f}, "
          f"max uncertainty: {float(np.asarray(unc).max()):.3f}")
    assert depth_after < 0.25 * depth_before, "warp did not push points to the boundary"

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(*np.vstack([boundary, boundary[:1]]).T, "k-", lw=2, label="obstacle")
        ax.plot(traj[:, 0], traj[:, 1], "b--", label="original")
        ax.plot(warped[:, 0], warped[:, 1], "r-", label="warped")
        ax.quiver(warped[::6, 0], warped[::6, 1], new_vel[::6, 0], new_vel[::6, 1],
                  angles="xy", width=3e-3, color="g")
        ax.legend()
        ax.set_aspect("equal")
        fig.savefig("obstacle_flow_field_2d.png", dpi=120)
        print("saved obstacle_flow_field_2d.png")


if __name__ == "__main__":
    main()
