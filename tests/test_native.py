"""Native C++ host-kernel tests: the CART split kernel must agree with the
numpy fallback decision-for-decision (same semantics, float64)."""
import numpy as np
import pytest

from gaussian_process_transportation_tpu import native
from gaussian_process_transportation_tpu.models import random_forest as rf


def _numpy_best_split(X, y):
    """The fallback path, invoked directly (bypassing native dispatch)."""
    import unittest.mock as mock

    with mock.patch.object(native, "available", lambda: False):
        return rf._best_split(X, y)


def test_native_builds_on_this_toolchain():
    # g++ is part of this image; a silent fallback here would hide a
    # build regression.
    assert native.available()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed", range(8))
def test_split_parity_random(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(5, 200)
    d = rng.randint(1, 5)
    P = rng.randint(1, 4)
    X = rng.randn(n, d)
    y = rng.randn(n, P)
    got = native.cart_best_split(X, y)
    want = _numpy_best_split(X, y)
    assert got is not None and want is not None
    assert got[0] == want[0]
    np.testing.assert_allclose(got[1], want[1], rtol=1e-12)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_split_parity_ties_and_degenerate():
    # duplicated column values force the tie-skipping branch
    X = np.array([[0.0], [0.0], [0.0], [1.0], [1.0]])
    y = np.array([[0.0], [0.1], [-0.1], [5.0], [5.2]])
    got = native.cart_best_split(X, y)
    want = _numpy_best_split(X, y)
    assert got == want == (0, 0.5)
    # constant feature: no valid split either way
    assert native.cart_best_split(np.zeros((5, 1)), y) is None
    assert _numpy_best_split(np.zeros((5, 1)), y) is None


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_forest_predictions_match_fallback():
    import unittest.mock as mock

    rng = np.random.RandomState(0)
    X = rng.randn(120, 2)
    Y = np.stack([np.sin(X[:, 0]), X.prod(1)], 1) + 0.05 * rng.randn(120, 2)
    params_native = rf.fit_forest(X, Y, n_estimators=8, max_depth=4, seed=3)
    with mock.patch.object(native, "available", lambda: False):
        params_numpy = rf.fit_forest(X, Y, n_estimators=8, max_depth=4, seed=3)
    np.testing.assert_array_equal(
        np.asarray(params_native.feature), np.asarray(params_numpy.feature)
    )
    np.testing.assert_allclose(
        np.asarray(params_native.threshold),
        np.asarray(params_numpy.threshold),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(params_native.value), np.asarray(params_numpy.value), rtol=1e-10
    )
