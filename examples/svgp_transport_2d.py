"""SVGP transport on the 2-D drawing (reference
``example/2D/torch/surface_generalization_with_svgp.py``): sparse
variational delta map with derivative posteriors for velocity variance.

Run:  python examples/svgp_transport_2d.py [--cpu] [--natgrad]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--natgrad", action="store_true")
    p.add_argument("--data", default="/root/reference/example/2D/data/example.npz")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import gaussian_process_transportation_tpu as gpt
    from gaussian_process_transportation_tpu.transport import SVGPTransport

    data = np.load(args.data)
    X = np.asarray(gpt.resample(jnp.asarray(data["demo"]), num_points=200))
    S = np.asarray(gpt.resample(jnp.asarray(data["floor"]), num_points=100))
    S1 = np.asarray(gpt.resample(jnp.asarray(data["newfloor"]), num_points=100))
    dX = np.zeros_like(X)
    dX[:-1] = np.diff(X, axis=0)

    tr = SVGPTransport()
    tr.source_distribution, tr.target_distribution = S, S1
    tr.training_traj, tr.training_delta = X, dX
    import time

    t0 = time.time()
    tr.fit_transportation(num_epochs=200, num_inducing=50)
    if args.natgrad:
        # swap in natural-gradient training for the delta map
        from gaussian_process_transportation_tpu.models import svgp as svgp_mod

        m = tr.gp_delta_map
        m.state = svgp_mod.fit_natgrad(
            m.kernel, m.X, m.Y, num_inducing=m.num_inducing, num_epochs=100
        )
        m.collapsed = svgp_mod.collapse(m.state)
    tr.apply_transportation()
    print(f"SVGP transport fit+apply: {time.time()-t0:.1f}s")
    print("transported traj finite:", bool(jnp.isfinite(jnp.asarray(tr.training_traj)).all()))
    print("velocity variance range:",
          float(jnp.min(tr.var_vel_transported)), float(jnp.max(tr.var_vel_transported)))
    samples = tr.sample_transportation()
    print("posterior transport samples:", samples.shape)


if __name__ == "__main__":
    main()
