"""Multi-reference-frame benchmark (the paper's quantitative study).

Parity with ``example/comparisons/multi_reference_frames/models/model_gpt.py``
and ``ablation_study_gpt.py``: each method reproduces demo i under the frame
configuration of demo k; metrics are Fréchet, area-between-curves, DTW,
final-position error and final-angle error (computed in the goal frame);
plus an out-of-distribution study with randomly perturbed frames.

Metrics run on-device (``utils.metrics``); the (source, target) sweep is a
Python loop over ~9×8 cheap transports (each a single jit call).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import kernels as K
from ..transport.gpt import GaussianProcessTransportation
from ..data.datasets import (
    load_reach_target,
    distribution_from_frames,
    generate_frame_orientation,
)
from ..utils import metrics


def default_mrf_kernel() -> K.Kernel:
    """C(√10)·RBF(20, bounds [10,50]) + White(0.01, bounds ~fixed)
    (``model_gpt.py:14``)."""
    return (
        K.Constant(np.sqrt(10.0))
        * K.RBF(20.0 * jnp.ones(1), bounds=(10.0, 50.0))
        + K.White(0.01, bounds=(1e-7, 1e-6))
    )


class MultipleReferenceFramesGPT:
    def __init__(self, kernel: Optional[K.Kernel] = None, **gp_kwargs):
        self.kernel = kernel if kernel is not None else default_mrf_kernel()
        self.gp_kwargs = gp_kwargs

    def load_dataset(self, path: Optional[str] = None):
        d = load_reach_target(path)
        self.demos_x = d["x"]
        self.demos_A = d["A"]
        self.demos_b = d["b"]
        self.distribution_training_set = distribution_from_frames(d["A"], d["b"])
        n = len(self.demos_x)
        self.final_distance = np.zeros((n, 2))
        self.final_orientation = np.zeros(n)
        for i in range(n):
            A1 = np.asarray(self.demos_A[i][0][1])
            b1 = np.asarray(self.demos_b[i][0][1])
            self.final_distance[i] = np.linalg.inv(A1) @ (self.demos_x[i][-1] - b1)
            fd = np.linalg.inv(A1) @ (self.demos_x[i][-1] - self.demos_x[i][-2])
            self.final_orientation[i] = np.arctan2(fd[1], fd[0])

    def load_test_dataset(self, test_A, test_b):
        self.distribution_test_set = distribution_from_frames(test_A, test_b)
        self.test_A = test_A
        self.test_b = test_b

    def _transport(self, X, source_dist, target_dist):
        tr = GaussianProcessTransportation(kernel_transport=self.kernel, **self.gp_kwargs)
        tr.source_distribution = source_dist
        tr.target_distribution = target_dist
        tr.training_traj = X
        tr.fit_transportation(do_scale=True, do_rotation=True)
        tr.apply_transportation()
        return np.asarray(tr.training_traj), np.asarray(tr.std)

    def reproduce(self, index_source: int, index_target: int, compute_metrics: bool = True):
        X = self.demos_x[index_source]
        X1, std = self._transport(
            X,
            self.distribution_training_set[index_source],
            self.distribution_training_set[index_target],
        )
        if not compute_metrics:
            return X1, std
        ref = jnp.asarray(self.demos_x[index_target])
        got = jnp.asarray(X1)
        df = float(metrics.frechet_distance(ref, got))
        area = float(metrics.area_between_curves(ref, got))
        dtw = float(metrics.dtw_distance(ref, got))
        A1 = np.asarray(self.demos_A[index_target][0][1])
        b1 = np.asarray(self.demos_b[index_target][0][1])
        fd = np.linalg.inv(A1) @ (X1[-1] - b1)
        fde = float(np.linalg.norm(self.final_distance[index_target] - fd))
        fv = np.linalg.inv(A1) @ (X1[-1] - X1[-5])
        fda = float(np.abs(np.arctan2(fv[1], fv[0]) - self.final_orientation[index_target]))
        return df, area, dtw, fde, fda

    def generalize(self, index_source: int, index_target: int, compute_metrics: bool = True):
        """Transport onto an OOD frame configuration; metrics are the
        frame-relative final position/angle (no ground-truth trajectory)."""
        X = self.demos_x[index_source]
        X1, std = self._transport(
            X,
            self.distribution_training_set[index_source],
            self.distribution_test_set[index_target],
        )
        if not compute_metrics:
            return X1, std
        A1 = np.asarray(self.test_A[index_target][0][1])
        b1 = np.asarray(self.test_b[index_target][0][1])
        fd = np.linalg.inv(A1) @ (X1[-1] - b1)
        fde = float(np.linalg.norm(self.final_distance[index_source] - fd))
        fv = np.linalg.inv(A1) @ (X1[-1] - X1[-5])
        fda = float(np.abs(np.arctan2(fv[1], fv[0]) - self.final_orientation[index_source]))
        return fde, fda


def ablation_study(
    policy: Optional[MultipleReferenceFramesGPT] = None,
    number_repetitions: int = 20,
    path: Optional[str] = None,
    seed: int = 0,
    ood: bool = True,
) -> Dict[str, np.ndarray]:
    """The reference's ablation protocol (``ablation_study_gpt.py:29-69``):
    repetitions × all-targets reproduction metrics + OOD generalization."""
    rng = np.random.RandomState(seed)
    policy = policy or MultipleReferenceFramesGPT(optimizer=None)
    policy.load_dataset(path)
    n = len(policy.demos_x)

    rows = {k: [] for k in ("df", "area", "dtw", "fde", "fda")}
    for _ in range(number_repetitions):
        i = rng.randint(n)
        for k in (j for j in range(n) if j != i):
            df, area, dtw, fde, fda = policy.reproduce(i, k)
            for key, v in zip(rows, (df, area, dtw, fde, fda)):
                rows[key].append(v)

    out = {k: np.asarray(v) for k, v in rows.items()}
    if ood:
        fde_o, fda_o = [], []
        for _ in range(number_repetitions):
            A_new, b_new = generate_frame_orientation(policy.demos_A, policy.demos_b, rng)
            i = rng.randint(n)
            policy.load_test_dataset(A_new, b_new)
            for k in range(len(A_new)):
                fde, fda = policy.generalize(i, k)
                fde_o.append(fde)
                fda_o.append(fda)
        out["fde_ood"] = np.asarray(fde_o)
        out["fda_ood"] = np.asarray(fda_o)
    return out


_METRIC_TITLES = (
    ("df", "Frechet Distance"),
    ("area", "Area btw curves"),
    ("dtw", "Dynamic Time Warping"),
    ("fde", "Final Position Error"),
    ("fda", "Final Orientation Error"),
)


def compare_methods(
    methods: Optional[Dict[str, object]] = None,
    number_repetitions: int = 5,
    path: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Cross-method reproduction metrics on the reach_target dataset —
    the data-collection half of the reference's
    ``data_analysis_dataset.py`` (its ``*_dataset.npz`` files, here
    produced in-process from the in-repo baselines).

    Returns metric title → (method name → samples), ready for
    ``statistics.ranking_report`` / ``statistics.ranked_boxplot``.
    ``methods`` defaults to GPT + the in-repo DMP / TP-GMM / HMM
    baselines (each must expose ``load_dataset``/``fit?``/``reproduce``).
    """
    if methods is None:
        from .baselines import (
            MultipleReferenceFramesDMP,
            MultipleReferenceFramesHMM,
            MultipleReferenceFramesTPGMM,
        )

        methods = {
            "GPT": MultipleReferenceFramesGPT(optimizer=None),
            "DMP": MultipleReferenceFramesDMP(),
            "TPGMM": MultipleReferenceFramesTPGMM(),
            "HMM": MultipleReferenceFramesHMM(),
        }
    rng = np.random.RandomState(seed)
    samples: Dict[str, Dict[str, list]] = {
        title: {name: [] for name in methods} for _, title in _METRIC_TITLES
    }
    pairs = None
    for name, policy in methods.items():
        policy.load_dataset(path)
        if hasattr(policy, "fit"):
            policy.fit()
        n = len(policy.demos_x)
        if pairs is None:
            pairs = [
                (rng.randint(n), k)
                for _ in range(number_repetitions)
                for k in range(n)
            ]
        import inspect

        takes_source = "index_source" in inspect.signature(
            policy.reproduce
        ).parameters
        for i, k in pairs:
            if i == k:
                continue
            # generative baselines (TP-GMM, HMM+LQR) reproduce FOR a frame
            # configuration — no source index (reference model_hmm.py /
            # model_tp_gmm.py semantics)
            vals = policy.reproduce(i, k) if takes_source else policy.reproduce(k)
            for (key, title), v in zip(_METRIC_TITLES, vals):
                samples[title][name].append(float(v))
    return {
        title: {name: np.asarray(v) for name, v in per.items()}
        for title, per in samples.items()
    }
