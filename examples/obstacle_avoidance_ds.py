"""Dynamical-system obstacle avoidance demos (reference
``policy_transportation/obstacle_avoidance/non_linear_DS_from_ROAM_2023.py:7-120``
and ``dynamic_modulation_2019.py:34-74``):

1. a *wavy* nonlinear DS (rotation-by-distance) modulated around ellipse +
   cuboid obstacles with the full interpolation-moving avoidance;
2. the 50-agent linear-DS modulation rollout, here one batched
   ``lax.scan`` program instead of a Python double loop.

Run:  python examples/obstacle_avoidance_ds.py [--cpu] [--plot]
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

    from gaussian_process_transportation_tpu.avoidance import (
        Obstacles,
        avoid,
        gamma,
        modulate_multiple,
        rollout,
    )

    obs = Obstacles.from_dicts(
        [
            {
                "shape": "ellipse",
                "center": np.array([4.0, 1.5]),
                "axis_length": np.array([2.5, 1.5]),
                "orientation": 30,
                "margin": 0.1,
            },
            {
                "shape": "cuboid",
                "center": np.array([7.0, -1.5]),
                "axis_length": np.array([2.0, 1.5]),
                "orientation": -15,
                "margin": 0.1,
            },
        ]
    )
    attractor = jnp.asarray([10.0, 0.0])

    def wavy(x):
        """Rotation-by-distance nonlinear DS (ROAM demo, reference :12-25)."""
        diff = attractor[None, :] - x
        dist = jnp.linalg.norm(diff, axis=1)
        c, s = jnp.cos(jnp.sin(dist)), jnp.sin(jnp.sin(dist))
        R = jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=1
        )  # (N,2,2)
        return (R @ diff[:, :, None])[:, :, 0]

    # --- demo 1: full avoid() on the wavy DS -------------------------------
    x0 = jnp.asarray(np.stack([np.zeros(9), np.linspace(-3, 3, 9)], axis=1))

    def step(x, _):
        x_new = x + 0.03 * avoid(obs, x, wavy(x))
        return x_new, x_new

    _, traj = jax.lax.scan(step, x0, None, length=600)
    traj = np.asarray(traj)  # (T, 9, 2)
    g_min = float(np.asarray(gamma(obs, jnp.asarray(traj.reshape(-1, 2)))).min())
    final_err = np.linalg.norm(traj[-1] - np.asarray(attractor), axis=1)
    print(f"wavy DS: min Γ along 9 rollouts = {g_min:.3f} (>=1 ⇒ no penetration)")
    print(f"wavy DS: agents within 1.0 of attractor: {(final_err < 1.0).sum()}/9")

    # --- demo 2: 50-agent modulated linear DS (one scan) -------------------
    x0b = jnp.asarray(np.stack([np.full(50, -2.0), np.linspace(-4, 4, 50)], axis=1))
    trajb = rollout(
        lambda x: 0.2 * (attractor[None] - x),
        lambda x: modulate_multiple(obs, x),
        x0b,
        n_steps=800,
        dt=0.25,
    )
    gb = float(np.asarray(gamma(obs, jnp.asarray(np.asarray(trajb).reshape(-1, 2)))).min())
    print(f"50-agent linear DS: min Γ = {gb:.3f}, traj shape {np.asarray(trajb).shape}")

    # --- demo 3: the ROAM-2023 vector-field scene --------------------------
    # Exact reproduction of the reference's figure setup
    # (non_linear_DS_from_ROAM_2023.py:29-76): three rotated ellipses with
    # off-center reference points, wavy DS toward attractor (-1, -1),
    # 20×20 grid, raw vs modulated field — here ONE batched avoid() call
    # over all 400 grid points instead of the reference's double loop.
    obs_roam = Obstacles.from_dicts(
        [
            {"shape": "ellipse", "center": np.array([0.20, -3.1]),
             "reference_point": np.array([0.0, 0.3]),
             "axis_length": np.array([0.3, 0.7]), "orientation": 0},
            {"shape": "ellipse", "center": np.array([0.45, -2.65]),
             "reference_point": np.array([0.0, 0.3]),
             "axis_length": np.array([0.3, 0.7]), "orientation": 120},
            {"shape": "ellipse", "center": np.array([-0.05, -2.65]),
             "reference_point": np.array([0.0, 0.3]),
             "axis_length": np.array([0.3, 0.7]), "orientation": 240},
        ]
    )
    attractor_roam = jnp.asarray([-1.0, -1.0])

    def wavy_roam(x):
        diff = attractor_roam[None, :] - x
        dist = jnp.linalg.norm(diff, axis=1)
        c, s = jnp.cos(jnp.sin(dist)), jnp.sin(jnp.sin(dist))
        R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=1)
        return (R @ diff[:, :, None])[:, :, 0]

    gx, gy = np.meshgrid(np.linspace(-5, 1, 20), np.linspace(-5, 1, 20))
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1))
    raw_field = np.asarray(wavy_roam(grid))
    mod_field = np.array(jax.jit(lambda g: avoid(obs_roam, g, wavy_roam(g)))(grid))
    inside = np.asarray(gamma(obs_roam, grid)).min(axis=0) <= 1.0
    mod_field[inside] = 0.0  # modulation diverges inside obstacles (Γ ≤ 1)
    outside = np.asarray(gamma(obs_roam, grid)).min(axis=0) > 1.0  # (K,N) → per-point
    print(
        f"ROAM field: {outside.sum()}/400 grid points outside obstacles; "
        f"modulated field finite: {np.isfinite(mod_field[outside]).all()}"
    )

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(17, 5))
        for a, tr, title in ((axes[0], traj, "wavy DS + avoid()"),
                             (axes[1], np.asarray(trajb), "50-agent modulated linear DS")):
            for i in range(tr.shape[1]):
                a.plot(tr[:, i, 0], tr[:, i, 1], lw=0.8)
            a.scatter(*np.asarray(attractor), marker="*", s=150, c="k")
            a.set_title(title)
        # ROAM scene: normalized raw (green) vs modulated (magenta) quivers
        a = axes[2]
        rn = raw_field / np.maximum(np.linalg.norm(raw_field, axis=1, keepdims=True), 1e-9)
        mn = mod_field / np.maximum(np.linalg.norm(mod_field, axis=1, keepdims=True), 1e-9)
        a.quiver(gx, gy, rn[:, 0].reshape(gx.shape), rn[:, 1].reshape(gx.shape),
                 scale=35, width=0.004, color="g", alpha=0.6)
        a.quiver(gx, gy, mn[:, 0].reshape(gx.shape), mn[:, 1].reshape(gx.shape),
                 scale=35, width=0.004, color="m", alpha=0.8)
        a.plot(-1.0, -1.0, "k*", markersize=14)
        th = np.linspace(0, 2 * np.pi, 60)
        for k in range(3):
            c = np.asarray(obs_roam.center[k])
            ax_l = np.asarray(obs_roam.axis_length[k]) / 2.0
            ang = float(obs_roam.orientation[k]) * np.pi / 180.0
            R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
            ring = (R @ np.stack([ax_l[0] * np.cos(th), ax_l[1] * np.sin(th)])).T + c
            a.fill(ring[:, 0], ring[:, 1], color=(0.5, 0.2, 0.2), alpha=0.7)
        a.set_aspect("equal")
        a.set_title("ROAM-2023 wavy field: raw vs modulated")
        fig.savefig("obstacle_avoidance_ds.png", dpi=120)
        print("saved obstacle_avoidance_ds.png")


if __name__ == "__main__":
    main()
