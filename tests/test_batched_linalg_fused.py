"""Fused Pallas E-last chol+inverse (ops/batched_linalg.py) vs the
unrolled XLA chain and numpy — interpret mode on CPU.

The fused kernel is the transport fit-stage hot path on TPU (2.7 ms vs
16.3 ms unrolled at n=20, E=16384 on v5e-1, VERDICT r4 #7); these tests
pin its math so the TPU routing in transport/gpt.py is a pure relayout.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_process_transportation_tpu.ops.batched_linalg import (
    spd_inverse_elast,
    spd_inverse_elast_fused,
)


def _spd_batch(n, E, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((E, n, n)).astype(np.float32)
    K = np.einsum("eij,ekj->eik", A, A) + 3 * np.eye(n, dtype=np.float32)
    return K


@pytest.mark.parametrize("n,E,lanes", [(20, 70, 64), (7, 129, 128), (32, 64, 64)])
def test_fused_matches_unrolled_and_numpy(n, E, lanes):
    K = _spd_batch(n, E)
    Ke = jnp.asarray(np.transpose(K, (1, 2, 0)))
    L0, Ki0 = spd_inverse_elast(Ke)
    L1, Ki1 = spd_inverse_elast_fused(Ke, interpret=True, lanes=lanes)
    np.testing.assert_allclose(np.asarray(L0), np.asarray(L1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Ki0), np.asarray(Ki1), atol=2e-5)
    ref = np.linalg.inv(K.astype(np.float64))
    got = np.transpose(np.asarray(Ki1), (2, 0, 1))
    assert np.abs(got - ref).max() < 1e-4


def test_fused_lower_triangular_and_reconstruction():
    n, E = 12, 40
    K = _spd_batch(n, E, seed=3)
    Ke = jnp.asarray(np.transpose(K, (1, 2, 0)))
    L, Ki = spd_inverse_elast_fused(Ke, interpret=True, lanes=64)
    Lb = np.transpose(np.asarray(L), (2, 0, 1))
    assert np.allclose(Lb, np.tril(Lb)), "L must be lower-triangular"
    np.testing.assert_allclose(
        np.einsum("eij,ekj->eik", Lb, Lb), K, rtol=2e-4, atol=2e-4
    )
