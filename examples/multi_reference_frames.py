"""Multi-reference-frame benchmark on reach_target (reference
``example/comparisons/multi_reference_frames/ablation_study_gpt.py``):
reproduction metrics over repetitions + out-of-distribution frames.

Run:  python examples/multi_reference_frames.py [--cpu] [--reps 5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--compare", action="store_true",
                   help="cross-method rankings + box plots "
                        "(data_analysis_dataset.py parity)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gaussian_process_transportation_tpu.benchmarks import ablation_study

    out = ablation_study(number_repetitions=args.reps, ood=True)
    for k in ("df", "area", "dtw", "fde", "fda", "fde_ood", "fda_ood"):
        v = out[k]
        print(f"{k:8s}: median {np.median(v):8.3f}  mean {v.mean():8.3f}  "
              f"p90 {np.percentile(v, 90):8.3f}  (n={len(v)})")

    if args.compare:
        # the reference's data_analysis_dataset.py workflow end-to-end:
        # cross-method metrics -> Mann-Whitney rankings -> rank-annotated
        # box plots (figs saved next to this script)
        from gaussian_process_transportation_tpu.benchmarks import (
            compare_methods,
            ranked_boxplot,
            ranking_report,
        )

        metrics = compare_methods(number_repetitions=max(2, args.reps // 2))
        print(ranking_report(metrics))
        out_png = os.path.join(os.path.dirname(__file__), "Box_plot_complete.png")
        ranked_boxplot(metrics, out_path=out_png)
        short = {
            t: metrics[t]
            for t in ("Frechet Distance", "Final Position Error",
                      "Final Orientation Error")
        }
        ranked_boxplot(
            short,
            out_path=os.path.join(os.path.dirname(__file__), "Box_plot_short.png"),
        )
        print(f"box plots saved: {out_png} (+ short variant)")


if __name__ == "__main__":
    main()
