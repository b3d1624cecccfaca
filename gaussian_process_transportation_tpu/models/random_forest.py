"""Random-forest regression: host CART fit, device gather-based inference.

Replaces sklearn's RandomForestRegressor in the reference
(``models/ensemble_random_forest.py:6-31``, used with n_estimators=50,
max_depth=5 by ``transportation/random_forest_transportation.py:22``).

Design: greedy CART split-finding is inherently sequential and data-
dependent — a poor fit for XLA — so trees are grown on the host (vectorized
numpy over candidate splits) into *perfect-binary-tree arrays* (feature,
threshold, leaf value per node).  Inference is then a fixed-depth gather
loop, jittable and vmappable over trees AND query points: the entire
50-tree forest predicts in one fused program on device.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ForestParams(NamedTuple):
    feature: Array  # (E, n_internal) int32, -1 = no split (leaf early)
    threshold: Array  # (E, n_internal)
    value: Array  # (E, n_nodes, P) node means (prediction at any depth)


def _fit_tree(X, y, depth, rng, min_samples_split=2):
    """Grow one CART tree into perfect-tree arrays (numpy, host)."""
    n, d = X.shape
    P = y.shape[1]
    n_internal = 2**depth - 1
    n_nodes = 2 ** (depth + 1) - 1
    feature = np.full(n_internal, -1, dtype=np.int32)
    threshold = np.full(n_internal, np.inf)
    value = np.zeros((n_nodes, P))

    # node -> sample indices
    stack = [(0, np.arange(n))]
    while stack:
        node, idx = stack.pop()
        yn = y[idx]
        value[node] = yn.mean(axis=0) if len(idx) else 0.0
        if node >= n_internal:
            continue
        if len(idx) < min_samples_split or np.allclose(yn, yn[0]):
            # leaf early: propagate value to descendants lazily via feature=-1
            _propagate(value, node, n_nodes)
            continue
        best = _best_split(X[idx], yn)
        if best is None:
            _propagate(value, node, n_nodes)
            continue
        f, thr = best
        feature[node] = f
        threshold[node] = thr
        mask = X[idx, f] <= thr
        stack.append((2 * node + 1, idx[mask]))
        stack.append((2 * node + 2, idx[~mask]))
    return feature, threshold, value


def _propagate(value, node, n_nodes):
    """Copy a leaf-early node's value to all its descendants."""
    frontier = [node]
    while frontier:
        m = frontier.pop()
        l, r = 2 * m + 1, 2 * m + 2
        if l < n_nodes:
            value[l] = value[node]
            frontier.append(l)
        if r < n_nodes:
            value[r] = value[node]
            frontier.append(r)


def _best_split(X, y):
    """Best (feature, threshold) by variance reduction.  Dispatches to the
    native C++ kernel (``native/cart.cpp``) when built — identical
    semantics — else the vectorized-numpy path below."""
    from .. import native

    if native.available():
        return native.cart_best_split(X, y)
    n, d = X.shape
    best_score, best = np.inf, None
    base_sum = y.sum(axis=0)
    base_sq = (y**2).sum(axis=0)
    for f in range(d):
        order = np.argsort(X[:, f], kind="stable")
        xs = X[order, f]
        ys = y[order]
        csum = np.cumsum(ys, axis=0)
        csq = np.cumsum(ys**2, axis=0)
        # candidate split after position i (1..n-1), skip ties
        valid = xs[1:] > xs[:-1]
        if not valid.any():
            continue
        i = np.arange(1, n)
        nl = i.astype(float)
        nr = n - nl
        sl, ssl = csum[:-1], csq[:-1]
        sr, ssr = base_sum - sl, base_sq - ssl
        sse = (ssl - sl**2 / nl[:, None]).sum(axis=1) + (
            ssr - sr**2 / nr[:, None]
        ).sum(axis=1)
        sse = np.where(valid, sse, np.inf)
        j = np.argmin(sse)
        if sse[j] < best_score:
            best_score = sse[j]
            best = (f, 0.5 * (xs[j] + xs[j + 1]))
    return best


def fit_forest(
    X,
    Y,
    n_estimators: int = 50,
    max_depth: int = 5,
    bootstrap: bool = True,
    seed: int = 0,
) -> ForestParams:
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    rng = np.random.RandomState(seed)
    feats, thrs, vals = [], [], []
    n = len(X)
    for _ in range(n_estimators):
        idx = rng.randint(0, n, n) if bootstrap else np.arange(n)
        f, t, v = _fit_tree(X[idx], Y[idx], max_depth, rng)
        feats.append(f)
        thrs.append(t)
        vals.append(v)
    return ForestParams(
        feature=jnp.asarray(np.stack(feats)),
        threshold=jnp.asarray(np.stack(thrs)),
        value=jnp.asarray(np.stack(vals)),
    )


@jax.jit
def forest_member_predict(params: ForestParams, x: Array) -> Array:
    """(E, Nq, P): each tree's prediction — fixed-depth gather descent."""
    n_internal = params.feature.shape[1]
    depth = int(np.log2(n_internal + 1))

    def one_tree(feature, threshold, value):
        def descend(xi):
            def body(_, node):
                f = feature[node]
                # feature == -1 → threshold inf → always goes left; value was
                # propagated to descendants so the answer is unchanged.
                go_left = xi[jnp.maximum(f, 0)] <= threshold[node]
                return jnp.where(go_left, 2 * node + 1, 2 * node + 2)

            node = jax.lax.fori_loop(0, depth, body, jnp.int32(0))
            return value[node]

        return jax.vmap(descend)(x)

    return jax.vmap(one_tree)(params.feature, params.threshold, params.value)


class EnsembleRandomForest:
    """Reference interface (``Ensemble_RF``): mean/std over trees.

    Note: the reference's ``samples`` method has a latent bug (undefined
    ``nn``, ``ensemble_random_forest.py:29``); here it correctly returns
    per-tree predictions.
    """

    def __init__(self, n_estimators: int = 50, max_depth: int = 5, seed: int = 0):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.seed = seed
        self.params: Optional[ForestParams] = None

    def fit(self, X, Y):
        self.params = fit_forest(
            X, Y, n_estimators=self.n_estimators, max_depth=self.max_depth, seed=self.seed
        )
        return self

    def predict(self, x, return_std: bool = False):
        preds = forest_member_predict(self.params, jnp.asarray(x))
        mean = preds.mean(axis=0)
        if return_std:
            return mean, preds.std(axis=0)
        return mean

    def samples(self, x):
        return forest_member_predict(self.params, jnp.asarray(x))
