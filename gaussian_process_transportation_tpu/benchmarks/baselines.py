"""Baseline policies for the multi-reference-frame benchmark.

Parity with the reference's comparison models:

* ``MultipleReferenceFramesDMP`` — the frame-blending affine baseline of
  ``models/model_dmp.py:67-106``: per-frame affine transports of the demo
  (start frame / goal frame), uniformly scaled, blended with a sigmoid.
* ``MultipleReferenceFramesTPGMM`` — TP-GMM/GMR (replaces the external
  ``tp_gmm`` package used by ``model_tp_gmm.py``).
* ``MultipleReferenceFramesHMM`` — HMM + LQR (replaces ``pbdlib``,
  ``model_hmm.py``).

All share the metric protocol of :class:`..benchmarks.multi_frame.MultipleReferenceFramesGPT`.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..transport.variants import (
    AffineTransportation,
    KMPTransport,
    LaplacianEditingTransport,
)
from ..models.tpgmm import TPGMM
from ..models.hmm_lqr import HMMLQR
from ..data.datasets import load_reach_target, distribution_from_frames
from ..utils import metrics


class _MetricsMixin:
    def _metrics(self, X1, index_target, A_list, b_list):
        ref = jnp.asarray(self.demos_x[index_target])
        got = jnp.asarray(X1)
        df = float(metrics.frechet_distance(ref, got))
        area = float(metrics.area_between_curves(ref, got))
        dtw = float(metrics.dtw_distance(ref, got))
        A1 = np.asarray(A_list[index_target][0][1])
        b1 = np.asarray(b_list[index_target][0][1])
        fd = np.linalg.inv(A1) @ (np.asarray(X1)[-1] - b1)
        fde = float(np.linalg.norm(self.final_distance[index_target] - fd))
        fv = np.linalg.inv(A1) @ (np.asarray(X1)[-1] - np.asarray(X1)[-5])
        fda = float(np.abs(np.arctan2(fv[1], fv[0]) - self.final_orientation[index_target]))
        return df, area, dtw, fde, fda

    def load_dataset(self, path: Optional[str] = None):
        d = load_reach_target(path)
        self.demos_x = d["x"]
        self.demos_dx = [np.vstack([np.diff(x, axis=0), np.zeros((1, x.shape[1]))]) for x in d["x"]]
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


class MultipleReferenceFramesDMP(_MetricsMixin):
    """Sigmoid blend of start-frame and goal-frame affine transports."""

    def _frame_points(self, A, b, i):
        """4-point distribution: both frame origins + y-axis tips
        (``model_dmp.py:18-27``)."""
        fd = 5.0
        A0, A1 = np.asarray(A[i][0][0]), np.asarray(A[i][0][1])
        b0, b1 = np.asarray(b[i][0][0]), np.asarray(b[i][0][1])
        return np.stack([b0, b0 + A0 @ [0, fd], b1, b1 + A1 @ [0, -fd]])

    def _transport(self, X, src_pts, tgt_pts, do_scale=False):
        tr = AffineTransportation()
        tr.source_distribution = src_pts
        tr.target_distribution = tgt_pts
        tr.training_traj = X
        tr.fit_transportation(do_scale=do_scale)
        tr.apply_transportation()
        return np.asarray(tr.training_traj), float(tr.affine_transform.scale)

    def _reproduce_to(self, X, src4, tgt4):
        _, scale = self._transport(X, src4, tgt4, do_scale=True)
        X_1, _ = self._transport(X, src4[0:2], tgt4[0:2])
        X_2, _ = self._transport(X, src4[2:4], tgt4[2:4])
        X_1 = X_1[0] + (X_1 - X_1[0]) * scale
        X_2 = X_2[-1] + (X_2 - X_2[-1]) * scale
        alpha = 1.0 / (1.0 + np.exp(-np.linspace(-5, 5, len(X_1))))
        return alpha[:, None] * X_2 + (1 - alpha[:, None]) * X_1

    def reproduce(self, index_source: int, index_target: int, compute_metrics: bool = True):
        X = self.demos_x[index_source]
        src4 = self._frame_points(self.demos_A, self.demos_b, index_source)
        tgt4 = self._frame_points(self.demos_A, self.demos_b, index_target)
        X1 = self._reproduce_to(X, src4, tgt4)
        if not compute_metrics:
            return X1, np.zeros_like(X1)
        return self._metrics(X1, index_target, self.demos_A, self.demos_b)


class MultipleReferenceFramesTPGMM(_MetricsMixin):
    def __init__(self, n_states: int = 3, n_data: int = 40):
        self.model = TPGMM(n_states=n_states, n_data=n_data)

    def fit(self, exclude: Optional[int] = None):
        idx = [i for i in range(len(self.demos_x)) if i != exclude]
        self.model.fit(
            [self.demos_x[i] for i in idx],
            [self.demos_A[i] for i in idx],
            [self.demos_b[i] for i in idx],
        )
        return self

    def reproduce(self, index_target: int, compute_metrics: bool = True):
        A_new = [np.asarray(self.demos_A[index_target][0][f]) for f in range(2)]
        b_new = [np.asarray(self.demos_b[index_target][0][f]) for f in range(2)]
        X1, _ = self.model.reproduce(A_new, b_new, n_points=len(self.demos_x[index_target]))
        if not compute_metrics:
            return X1
        return self._metrics(X1, index_target, self.demos_A, self.demos_b)


class MultipleReferenceFramesHMM(_MetricsMixin):
    def __init__(self, n_states: int = 5):
        self.model = HMMLQR(n_states=n_states)

    def fit(self, exclude: Optional[int] = None):
        idx = [i for i in range(len(self.demos_x)) if i != exclude]
        self.model.fit(
            [self.demos_x[i] for i in idx],
            [self.demos_dx[i] for i in idx],
            [self.demos_A[i] for i in idx],
            [self.demos_b[i] for i in idx],
        )
        return self

    def reproduce(self, index_target: int, compute_metrics: bool = True):
        A_new = [np.asarray(self.demos_A[index_target][0][f]) for f in range(2)]
        b_new = [np.asarray(self.demos_b[index_target][0][f]) for f in range(2)]
        X1 = self.model.reproduce(
            A_new, b_new, x0=self.demos_x[index_target][0], T=len(self.demos_x[index_target])
        )
        if not compute_metrics:
            return X1
        return self._metrics(X1, index_target, self.demos_A, self.demos_b)


class _TransportBaseline(_MetricsMixin):
    """Shared reproduce() for transport-variant baselines on reach_target
    (the reference's ``model_kmp.py`` / ``model_laplacian_editing.py``:
    4-point frame distributions, same metric protocol)."""

    def _frame_points4(self, A, b, i):
        fd = 5.0
        A0, A1 = np.asarray(A[i][0][0]), np.asarray(A[i][0][1])
        b0, b1 = np.asarray(b[i][0][0]), np.asarray(b[i][0][1])
        return np.stack([b0, b0 + A0 @ [0, fd], b1, b1 + A1 @ [0, -fd]])

    def _make_transport(self):
        raise NotImplementedError

    def reproduce(self, index_source: int, index_target: int, compute_metrics: bool = True):
        tr = self._make_transport()
        tr.source_distribution = self._frame_points4(self.demos_A, self.demos_b, index_source)
        tr.target_distribution = self._frame_points4(self.demos_A, self.demos_b, index_target)
        tr.training_traj = np.asarray(self.demos_x[index_source])
        tr.fit_transportation()
        tr.apply_transportation()
        X1 = np.asarray(tr.training_traj)
        if not compute_metrics:
            return X1, np.asarray(tr.std)
        return self._metrics(X1, index_target, self.demos_A, self.demos_b)


class MultipleReferenceFramesKMP(_TransportBaseline):
    def _make_transport(self):
        # reference model_kmp.py:14 — do_scale + bounded hyperparameters
        from .. import kernels as K
        import jax.numpy as jnp

        kernel = (
            K.Constant(0.1, bounds=(0.1, 5.0))
            * K.RBF(jnp.asarray([0.1]), bounds=(0.05, 0.2))
            + K.White(1e-5, bounds=(1e-5, 0.01))
        )
        return KMPTransport(kernel=kernel, do_scale=True)


class MultipleReferenceFramesLE(_TransportBaseline):
    def _make_transport(self):
        return LaplacianEditingTransport()
