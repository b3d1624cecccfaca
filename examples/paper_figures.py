"""Paper-figure reproductions (reference ``example/paper_figures/*.py``).

Rebuilds the reference's presentation figures from this framework's
building blocks, one panel per reference script:

- stream plot lifted to 3-D            (``stream_plot.py:1-23``)
- wavy sphere                          (``waivy_sphere.py:1-25``)
- GP-sampled surface + normal quiver   (``qvier_3d.py``, ``surface.py``,
                                        ``surface_vectors.py``, ``metal_surface.py``)
- tangent-plane vectors on a surface   (``surface_tangent.py``)
- LASA handwriting shapes grid         (``LASA_plot.py``, ``load_data.py``) —
  skipped gracefully if the dataset is not on disk.

Run:  python examples/paper_figures.py [--cpu] [--out paper_figures.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="paper_figures.png")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from gaussian_process_transportation_tpu.data.datasets import (
        load_lasa,
        random_gp_surface,
    )

    fig = plt.figure(figsize=(16, 10))

    # 1. Stream plot lifted to 3-D (stream_plot.py): extract streamlines of
    # the planar field (cos(x-y), sin(x-y)) and warp them onto a Gaussian bump.
    ax = fig.add_subplot(2, 3, 1, projection="3d")
    fig_tmp, ax_tmp = plt.subplots()
    x, y = np.mgrid[0:2.5:200j, -2.5:2.5:200j]
    res = ax_tmp.streamplot(x.T, y.T, np.cos(x - y), np.sin(x - y), color="k")
    plt.close(fig_tmp)
    for line in res.lines.get_paths():
        ox, oy = line.vertices.T
        ax.plot(1.2 * ox, 0.8 * oy, np.exp(-(ox**2 + oy**2) / 4), "k", lw=0.5)
    ax.set_title("streamlines lifted to 3D")

    # 2. Wavy sphere (waivy_sphere.py).
    ax = fig.add_subplot(2, 3, 2, projection="3d")
    theta, phi = np.meshgrid(
        np.linspace(0, 2 * np.pi, 100), np.linspace(0, np.pi, 50)
    )
    sx = np.sin(phi) * np.cos(theta)
    sy = np.sin(phi) * np.sin(theta)
    sz = np.cos(phi) + 0.2 * np.sin(10 * sx)
    ax.plot_surface(sx, sy, sz, cmap="viridis")
    ax.set_title("wavy sphere")

    # 3. GP-sampled random surface with surface-normal quiver
    # (surface.py / qvier_3d.py / surface_vectors.py / metal_surface.py).
    key = jax.random.PRNGKey(0)
    S = np.asarray(random_gp_surface(key, n=24, lengthscale=0.5, amplitude=0.3))
    GX, GY, GZ = S[..., 0], S[..., 1], S[..., 2]
    dzdy, dzdx = np.gradient(GZ, GY[:, 0], GX[0, :])
    norm = np.sqrt(dzdx**2 + dzdy**2 + 1.0)
    ax = fig.add_subplot(2, 3, 3, projection="3d")
    ax.plot_surface(GX, GY, GZ, cmap="coolwarm", alpha=0.8)
    st = 3
    ax.quiver(
        GX[::st, ::st], GY[::st, ::st], GZ[::st, ::st],
        (-dzdx / norm)[::st, ::st], (-dzdy / norm)[::st, ::st],
        (1.0 / norm)[::st, ::st],
        length=0.15, color="k",
    )
    ax.set_title("GP surface + normals")

    # 4. Tangent-plane vectors on the same surface (surface_tangent.py):
    # the two in-plane basis vectors (1,0,dz/dx), (0,1,dz/dy).
    ax = fig.add_subplot(2, 3, 4, projection="3d")
    ax.plot_surface(GX, GY, GZ, cmap="coolwarm", alpha=0.5)
    tnorm = np.sqrt(1.0 + dzdx**2)
    ax.quiver(
        GX[::st, ::st], GY[::st, ::st], GZ[::st, ::st],
        (1.0 / tnorm)[::st, ::st], np.zeros_like(GX)[::st, ::st],
        (dzdx / tnorm)[::st, ::st],
        length=0.15, color="b",
    )
    ax.set_title("tangent vectors")

    # 5/6. LASA shapes (LASA_plot.py) — demo trajectories for two shapes.
    for i, shape in enumerate(["Angle", "Sine"]):
        ax = fig.add_subplot(2, 3, 5 + i)
        try:
            demos = load_lasa(shape)
        except (FileNotFoundError, OSError, KeyError) as e:
            ax.set_title(f"LASA {shape}: dataset unavailable ({type(e).__name__})")
            continue
        for d in demos:
            ax.plot(d["pos"][:, 0], d["pos"][:, 1], lw=0.8)
        ax.set_title(f"LASA {shape} ({len(demos)} demos)")
        ax.set_aspect("equal")

    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
