"""Pallas TPU kernels for the GP hot path.

The dense-grid posterior-mean predict (the reference's 100×100-grid
vector-field evaluation, ``plot_utils.py:181-207`` — 10⁴ queries × N
training points) is ``k(X*, X) @ α``.  Done naively, the (Nq, N) Gram is
materialized in HBM (write + read ≈ 2·Nq·N·4 bytes).  ``fused_gp_predict_mean``
computes each query tile's Gram block in VMEM and immediately contracts it
with α, so the Gram never touches HBM — flash-attention-style fusion for
GP regression.

``rbf_gram`` is the tiled Gram builder for when the full matrix IS needed
(conditioning/Cholesky input).

Kernels assume the C·RBF(+White) family (the reference's transport kernel);
ARD lengthscales fold into the inputs by pre-scaling.  Off-TPU the kernels
run in interpret mode so CPU tests exercise the same code path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mean_kernel(xq_ref, xT_ref, alpha_ref, amp_ref, mean_ref, *, family: str):
    """Grid step (i, j): query tile i × training chunk j.

    xq_ref: (TM, D) scaled queries; xT_ref: (D, TK) scaled training points
    TRANSPOSED (so the per-dimension row read is a static sublane slice —
    Mosaic cannot lower the gather that `x[None, :, d]` indexing builds);
    alpha_ref: (TK, P); amp_ref: (1, 1) SMEM; mean_ref: (TM, P) accumulator.
    ``family`` selects the stationary covariance (RBF / Matern) — pure
    elementwise VPU math, identical tiling.
    """
    from .blocked_chol import stationary_from_sqdist

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        mean_ref[:] = jnp.zeros_like(mean_ref)

    # d² by unrolled per-dimension differences — pure VPU, exact, and no
    # padded-to-128 MXU contraction over the tiny D (see kernels._sqdist)
    D = xq_ref.shape[1]
    d2 = jnp.zeros((xq_ref.shape[0], xT_ref.shape[1]), jnp.float32)
    for d in range(D):
        diff = xq_ref[:, d : d + 1] - xT_ref[d : d + 1, :]  # (TM, TK)
        d2 = d2 + diff * diff
    k = amp_ref[0, 0] * stationary_from_sqdist(d2, family)  # (TM, TK)
    mean_ref[:] += jnp.dot(k, alpha_ref[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


def fused_gp_predict_mean(
    Xq: Array,
    X: Array,
    alpha: Array,
    lengthscale: Array,
    amplitude,
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: Optional[bool] = None,
    family: str = "rbf",
) -> Array:
    """Posterior mean k(X*,X) α for a C·stationary(+White) GP without ever
    materializing the Gram in HBM.  Returns (Nq, P) float32."""
    if interpret is None:
        interpret = not _on_tpu()
    Nq, D = Xq.shape
    N, P = alpha.shape
    dtype = jnp.float32

    ls = jnp.atleast_1d(jnp.asarray(lengthscale)).astype(dtype)
    Xq_s = (Xq / ls).astype(dtype)
    X_s = (X / ls).astype(dtype)

    Nq_p = _round_up(max(Nq, 8), tile_q)
    N_p = _round_up(max(N, 8), tile_k)
    Xq_pad = jnp.zeros((Nq_p, D), dtype).at[:Nq].set(Xq_s)
    # pad training points far away so their kernel value underflows to 0;
    # training points go in TRANSPOSED (D, N_p) so the kernel's
    # per-dimension reads are static sublane slices
    XT_pad = jnp.full((D, N_p), 1e6, dtype).at[:, :N].set(X_s.T)
    alpha_pad = jnp.zeros((N_p, P), dtype).at[:N].set(jnp.asarray(alpha, dtype))
    amp = jnp.asarray([[amplitude]], dtype)

    grid = (Nq_p // tile_q, N_p // tile_k)
    mean = pl.pallas_call(
        functools.partial(_mean_kernel, family=family),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, P), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, P), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nq_p, P), dtype),
        interpret=interpret,
    )(Xq_pad, XT_pad, alpha_pad, amp)
    return mean[:Nq]


def _mean_var_kernel(
    xq_ref, xT_ref, alpha_ref, kinv_ref, xTfull_ref, amp_ref, prior_ref,
    mean_ref, var_ref, w_ref, *, family: str, tile_k: int,
):
    """Grid step (i, a): query tile i × training chunk a.

    Accumulates mean += k·α[a] and the whitened row W += k·K⁻¹[a, :]
    (W: (TM, N) VMEM scratch).  On the LAST a-chunk the variance
    var = prior − Σ_b W[:, b]·k[:, b] is closed with a second unrolled
    pass over the chunks, recomputing each k tile in VMEM — the (Nq, N)
    Gram is built twice but never touches HBM (VERDICT r3 #5).
    """
    from .blocked_chol import stationary_from_sqdist

    a = pl.program_id(1)
    n_a = pl.num_programs(1)
    D = xq_ref.shape[1]
    TM = xq_ref.shape[0]

    @pl.when(a == 0)
    def _():
        mean_ref[:] = jnp.zeros_like(mean_ref)
        w_ref[:] = jnp.zeros_like(w_ref)

    d2 = jnp.zeros((TM, xT_ref.shape[1]), jnp.float32)
    for d in range(D):
        diff = xq_ref[:, d : d + 1] - xT_ref[d : d + 1, :]
        d2 = d2 + diff * diff
    k = amp_ref[0, 0] * stationary_from_sqdist(d2, family)  # (TM, TK)
    hi = jax.lax.Precision.HIGHEST
    mean_ref[:] += jnp.dot(k, alpha_ref[:], preferred_element_type=jnp.float32,
                           precision=hi)
    w_ref[:] += jnp.dot(k, kinv_ref[:], preferred_element_type=jnp.float32,
                        precision=hi)

    @pl.when(a == n_a - 1)
    def _():
        acc = jnp.zeros((TM, 1), jnp.float32)
        for b in range(n_a):
            sl = slice(b * tile_k, (b + 1) * tile_k)
            d2b = jnp.zeros((TM, tile_k), jnp.float32)
            for d in range(D):
                diff = xq_ref[:, d : d + 1] - xTfull_ref[d : d + 1, sl]
                d2b = d2b + diff * diff
            kb = amp_ref[0, 0] * stationary_from_sqdist(d2b, family)
            acc = acc + jnp.sum(w_ref[:, sl] * kb, axis=1, keepdims=True)
        var_ref[:] = jnp.maximum(prior_ref[0, 0] - acc, 0.0)


def fused_gp_predict_mean_var(
    Xq: Array,
    X: Array,
    alpha: Array,
    K_inv: Array,
    lengthscale: Array,
    amplitude,
    prior_diag,
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: Optional[bool] = None,
    family: str = "rbf",
) -> Tuple[Array, Array]:
    """Posterior mean AND variance on a dense grid, Gram never in HBM.

    mean = k* α;  var = prior − diag(k* K⁻¹ k*ᵀ), clamped at 0 — the
    reference's 100×100-grid *uncertainty* fields (``plot_utils.py:10-24``)
    fused the same way as the mean path.  Requires the dense K⁻¹ (cache it
    with ``condition(..., cache_k_inv=True)``); VMEM holds a
    (tile_k + tile_q, N) working set, so N ≲ 4096 at the default tiles —
    callers fall back to the XLA path above that.
    Returns (mean (Nq, P), var (Nq,)) float32.
    """
    if interpret is None:
        interpret = not _on_tpu()
    Nq, D = Xq.shape
    N, P = alpha.shape
    dtype = jnp.float32

    ls = jnp.atleast_1d(jnp.asarray(lengthscale)).astype(dtype)
    Xq_s = (Xq / ls).astype(dtype)
    X_s = (X / ls).astype(dtype)

    Nq_p = _round_up(max(Nq, 8), tile_q)
    N_p = _round_up(max(N, 8), tile_k)
    Xq_pad = jnp.zeros((Nq_p, D), dtype).at[:Nq].set(Xq_s)
    XT_pad = jnp.full((D, N_p), 1e6, dtype).at[:, :N].set(X_s.T)
    alpha_pad = jnp.zeros((N_p, P), dtype).at[:N].set(jnp.asarray(alpha, dtype))
    kinv_pad = jnp.zeros((N_p, N_p), dtype).at[:N, :N].set(
        jnp.asarray(K_inv, dtype)
    )
    amp = jnp.asarray([[amplitude]], dtype)
    prior = jnp.asarray([[prior_diag]], dtype)

    grid = (Nq_p // tile_q, N_p // tile_k)
    mean, var = pl.pallas_call(
        functools.partial(_mean_var_kernel, family=family, tile_k=tile_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda i, a: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_k), lambda i, a: (0, a), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, P), lambda i, a: (a, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, N_p), lambda i, a: (a, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N_p), lambda i, a: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, a: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, a: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, P), lambda i, a: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, a: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Nq_p, P), dtype),
            jax.ShapeDtypeStruct((Nq_p, 1), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((tile_q, N_p), dtype)],
        interpret=interpret,
    )(Xq_pad, XT_pad, alpha_pad, kinv_pad, XT_pad, amp, prior)
    return mean[:Nq], var[:Nq, 0]


def stationary_gram(
    X: Array,
    Z: Array,
    lengthscale: Array,
    amplitude,
    tile: int = 256,
    interpret: Optional[bool] = None,
    family: str = "rbf",
) -> Array:
    """Tiled stationary Gram amp·k((x−z)/ℓ): (N, M) float32."""
    from .blocked_chol import stationary_from_sqdist

    if interpret is None:
        interpret = not _on_tpu()
    N, D = X.shape
    M = Z.shape[0]
    dtype = jnp.float32
    ls = jnp.atleast_1d(jnp.asarray(lengthscale)).astype(dtype)
    Xs = (X / ls).astype(dtype)
    Zs = (Z / ls).astype(dtype)
    N_p, M_p = _round_up(max(N, 8), tile), _round_up(max(M, 8), tile)
    X_pad = jnp.full((N_p, D), 1e6, dtype).at[:N].set(Xs)
    ZT_pad = jnp.full((D, M_p), -1e6, dtype).at[:, :M].set(Zs.T)
    amp = jnp.asarray([[amplitude]], dtype)

    def kernel(x_ref, zT_ref, amp_ref, out_ref):
        d2 = jnp.zeros((x_ref.shape[0], zT_ref.shape[1]), jnp.float32)
        for d in range(x_ref.shape[1]):
            diff = x_ref[:, d : d + 1] - zT_ref[d : d + 1, :]
            d2 = d2 + diff * diff
        out_ref[:] = amp_ref[0, 0] * stationary_from_sqdist(d2, family)

    out = pl.pallas_call(
        kernel,
        grid=(N_p // tile, M_p // tile),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_p, M_p), dtype),
        interpret=interpret,
    )(X_pad, ZT_pad, amp)
    return out[:N, :M]


def rbf_gram(X, Z, lengthscale, amplitude, tile: int = 256,
             interpret: Optional[bool] = None) -> Array:
    """Back-compat alias: RBF Gram (see :func:`stationary_gram`)."""
    return stationary_gram(X, Z, lengthscale, amplitude, tile, interpret, "rbf")
