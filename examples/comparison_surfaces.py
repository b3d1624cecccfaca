"""Cross-method comparison on the 2-D drawing (reference
``example/comparisons/surfaces/comparison_transportation.py``): run all six
transport methods and print the KL / distribution-distance / Euclidean
matrices.

Run:  python examples/comparison_surfaces.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--data", default="/root/reference/example/2D/data/example.npz")
    p.add_argument("--out", default=None, help="directory for LaTeX tables")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gaussian_process_transportation_tpu.benchmarks import run_comparison
    from gaussian_process_transportation_tpu.benchmarks.comparison import save_array_as_latex

    data = np.load(args.data)
    out = run_comparison(data["demo"], data["floor"], data["newfloor"])

    names = out["names"]
    short = [n.split()[0][:4] + n.split()[-1][:4] for n in names]
    for key in ("euclidean_distance", "distribution_distance", "divergence"):
        print(f"\n{key}:")
        print("        " + " ".join(f"{s:>10s}" for s in short))
        for i, row in enumerate(out[key]):
            print(f"{short[i]:>8s}" + " ".join(f"{v:10.2f}" for v in row))
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            save_array_as_latex(out[key], os.path.join(args.out, key + ".txt"), names)


if __name__ == "__main__":
    main()
