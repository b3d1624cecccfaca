"""Blocked Cholesky with a Pallas panel kernel — the large-N exact-GP hot path.

Why this exists (measured on v5e-1, see CLAUDE.md):

* ``jnp.linalg.cholesky`` on TPU runs at ~12-13 TFLOP/s f32 at N=10240 —
  ~45% of the measured 27.6 TFLOP/s f32-highest matmul roofline — because
  its panel factorizations and triangular solves lower to sequential
  custom calls that ignore ``jax_default_matmul_precision``.
* An XLA-level blocked right-looking Cholesky loses even to that: each
  panel step pays a LAPACK-style small-cholesky custom call plus a
  triangular-solve custom call, and those dominate the runtime.

The fix is to *own the panel* in Mosaic: ``factor_panel`` is a single
Pallas kernel that factors a (B, B) SPD block into its lower Cholesky L
**and** the triangular inverse L⁻¹ in one pass — a Gauss-Jordan column
loop over 128×128 sub-blocks on the VPU with MXU matmuls for sub-block
corrections.  With L⁻¹ in hand, the outer algorithm needs **no**
triangular-solve custom calls at all:

* TRSM (panel below the diagonal)   → one GEMM against L⁻¹ᵀ (MXU),
* trailing SYRK update              → exact-FLOPs column-chunked GEMMs,
* forward/backward substitution     → blocked GEMMs with the retained
                                      diagonal-block inverses.

The matrix is held as a list of *lower-triangle column panels*
``panels[k] : (N - k·B, B)`` — half the memory of a dense (N, N) buffer
and, because every update replaces one whole panel functionally, XLA
performs them in place (no giant dynamic-update-slice copies).

Reference workloads this accelerates: the N=2500 surface Gram of
``example/3D/surface_generalization_3D.py:50-51`` and the 20 000-point
active-learning cap of ``models/gaussian_process_al.py:16``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SB = 128  # sub-block edge: one VPU-tile-friendly factorization unit

_HIGHEST = jax.lax.Precision.HIGHEST


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _dot(a: Array, b: Array, precision) -> Array:
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)


# ---------------------------------------------------------------------------
# Pallas panel kernel: chol + inverse of one (B, B) SPD block
# ---------------------------------------------------------------------------


def _factor_invert_base(D: Array) -> Tuple[Array, Array]:
    """(L, L⁻¹) of one (SB, SB) SPD block via a Gauss-Jordan column loop.

    Runs *inside* the Pallas kernel: SB sequential steps of pure VPU work
    on (SB, SB) tiles — no custom calls, no MXU.  The same elimination
    that builds L's columns is applied to the identity, so the triangular
    inverse falls out of the very same loop.
    """
    SB = D.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    eye = jnp.where(row_iota == col_iota, 1.0, 0.0).astype(D.dtype)

    sub = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)

    def step(j, carry):
        M, LT, X = carry
        # Mosaic has no dynamic_slice on register values — extract row j /
        # column j with masked broadcast-reduces instead (one VPU reduce
        # each).  The rank-1 update keeps M exactly symmetric, so the row
        # and column extractions never need a lane↔sublane transpose.
        row = jnp.sum(jnp.where(row_iota == j, M, 0.0), axis=0, keepdims=True)
        col = jnp.sum(jnp.where(col_iota == j, M, 0.0), axis=1, keepdims=True)
        djj = jnp.sum(jnp.where(lane == j, row, 0.0))
        d = jax.lax.rsqrt(djj)
        colv = jnp.where(lane >= j, row * d, 0.0)        # (1, SB) = L[:, j]ᵀ
        colT = jnp.where(sub >= j, col * d, 0.0)         # (SB, 1) = L[:, j]
        # trailing rank-1 update (applied everywhere; entries with
        # row/col < j are never read again)
        M = M - colT * colv
        # accumulate Lᵀ row j
        LT = jnp.where(row_iota == j, colv, LT)
        # Gauss-Jordan on the identity: row j of X scales by d, rows i > j
        # subtract l_ij · (d · X[j, :])
        xrow = jnp.sum(jnp.where(row_iota == j, X, 0.0), axis=0, keepdims=True) * d
        below = jnp.where(sub > j, colT, 0.0)
        X = X - below * xrow
        X = jnp.where(row_iota == j, xrow, X)
        return M, LT, X

    M0 = D
    LT0 = jnp.zeros_like(D)
    X0 = eye
    _, LT, X = jax.lax.fori_loop(0, SB, step, (M0, LT0, X0))
    return LT.T, X


def _factor_invert_base_r2(D: Array) -> Tuple[Array, Array]:
    """Rank-2 variant of :func:`_factor_invert_base`: each sequential step
    eliminates TWO columns (a 2×2 diagonal pivot), halving the loop length.

    The per-column step of the rank-1 loop costs ~560 ns on v5e — mostly
    cross-iteration dependency latency, not VPU element throughput — so
    halving the step count recovers a large fraction of the panel kernel's
    serial time (measured: 20 chained factor_panel(512) = 5.7 ms rank-1).
    Identical math to two rank-1 steps, reassociated; exactness checked
    against the rank-1 loop in tests/test_blocked_chol.py.
    """
    SB = D.shape[0]
    assert SB % 2 == 0
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    eye = jnp.where(row_iota == col_iota, 1.0, 0.0).astype(D.dtype)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)

    def step(t, carry):
        M, LT, X = carry
        j = 2 * t
        j1 = j + 1
        # extract pivot rows/columns (M stays exactly symmetric under the
        # rank-2 update, so rows double as columns without a transpose)
        row_j = jnp.sum(jnp.where(row_iota == j, M, 0.0), axis=0, keepdims=True)
        row_j1 = jnp.sum(jnp.where(row_iota == j1, M, 0.0), axis=0, keepdims=True)
        col_j = jnp.sum(jnp.where(col_iota == j, M, 0.0), axis=1, keepdims=True)
        col_j1 = jnp.sum(jnp.where(col_iota == j1, M, 0.0), axis=1, keepdims=True)
        d11 = jnp.sum(jnp.where(lane == j, row_j, 0.0))
        d12 = jnp.sum(jnp.where(lane == j1, row_j, 0.0))
        d22 = jnp.sum(jnp.where(lane == j1, row_j1, 0.0))
        inv11 = jax.lax.rsqrt(d11)
        l21 = d12 * inv11
        inv22 = jax.lax.rsqrt(d22 - l21 * l21)
        # L columns j, j+1 as row vectors (c) and column vectors (cT)
        c_j = jnp.where(lane >= j, row_j * inv11, 0.0)
        cT_j = jnp.where(sub >= j, col_j * inv11, 0.0)
        c_j1 = jnp.where(lane >= j1, (row_j1 - l21 * c_j) * inv22, 0.0)
        cT_j1 = jnp.where(sub >= j1, (col_j1 - l21 * cT_j) * inv22, 0.0)
        # rank-2 trailing update (one fused pass)
        M = M - cT_j * c_j - cT_j1 * c_j1
        LT = jnp.where(row_iota == j, c_j, LT)
        LT = jnp.where(row_iota == j1, c_j1, LT)
        # Gauss-Jordan on the identity, two coupled rows
        xrow_j = jnp.sum(jnp.where(row_iota == j, X, 0.0), axis=0, keepdims=True) * inv11
        xrow_j1 = (
            jnp.sum(jnp.where(row_iota == j1, X, 0.0), axis=0, keepdims=True)
            - l21 * xrow_j
        ) * inv22
        below_j = jnp.where(sub > j, cT_j, 0.0)
        below_j1 = jnp.where(sub > j1, cT_j1, 0.0)
        X = X - below_j * xrow_j - below_j1 * xrow_j1
        X = jnp.where(row_iota == j, xrow_j, X)
        X = jnp.where(row_iota == j1, xrow_j1, X)
        return M, LT, X

    _, LT, X = jax.lax.fori_loop(0, SB // 2, step, (D, jnp.zeros_like(D), eye))
    return LT.T, X


def _factor_invert_base_rk(D: Array, R: int) -> Tuple[Array, Array]:
    """Rank-R variant: each sequential step eliminates R columns via an
    R×R diagonal pivot factored with unrolled scalar Cholesky.

    Rationale (VERDICT r3 #6): the serial per-step cost is dominated by
    cross-iteration dependency latency, so halving the step count wins as
    long as the per-step cost grows sub-2× — measured rank-2 = 14.1 ms,
    rank-4 = 13.9 ms at N=10240 (the knee); rank-8 loses (the 8×8 scalar
    pivot's 36-extract chain eats the halving).  Exactness vs the rank-1
    loop is pinned in tests/test_blocked_chol.py.
    """
    SB = D.shape[0]
    assert SB % R == 0
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    eye = jnp.where(row_iota == col_iota, 1.0, 0.0).astype(D.dtype)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)

    def step(t, carry):
        M, LT, X = carry
        j0 = R * t
        js = [j0 + k for k in range(R)]
        # pivot rows/columns of the current trailing matrix (M stays
        # exactly symmetric under the rank-R update, so rows double as
        # columns without a lane<->sublane transpose)
        rows = [jnp.sum(jnp.where(row_iota == j, M, 0.0), axis=0, keepdims=True)
                for j in js]
        colsv = [jnp.sum(jnp.where(col_iota == j, M, 0.0), axis=1, keepdims=True)
                 for j in js]
        p = [[jnp.sum(jnp.where(lane == js[k], rows[i], 0.0))
              for k in range(i + 1)] for i in range(R)]
        # scalar Cholesky of the RxR pivot block
        inv = [None] * R
        l = [[0.0] * R for _ in range(R)]
        for i in range(R):
            acc = p[i][i]
            for m in range(i):
                acc = acc - l[i][m] * l[i][m]
            inv[i] = jax.lax.rsqrt(acc)
            for k in range(i + 1, R):
                s = p[k][i]
                for m in range(i):
                    s = s - l[k][m] * l[i][m]
                l[k][i] = s * inv[i]
        # L columns j0..j0+R-1 as row vectors (c, masked lane >= j) and
        # column vectors (cT, masked sublane >= j) — R chained rank-1
        # steps reassociated
        c, cT = [None] * R, [None] * R
        for k in range(R):
            rk, ck = rows[k], colsv[k]
            for m in range(k):
                rk = rk - l[k][m] * c[m]
                ck = ck - l[k][m] * cT[m]
            c[k] = jnp.where(lane >= js[k], rk * inv[k], 0.0)
            cT[k] = jnp.where(sub >= js[k], ck * inv[k], 0.0)
        # rank-R trailing update in one fused pass
        upd = cT[0] * c[0]
        for k in range(1, R):
            upd = upd + cT[k] * c[k]
        M = M - upd
        for k in range(R):
            LT = jnp.where(row_iota == js[k], c[k], LT)
        # Gauss-Jordan on the identity, R coupled rows
        xr = [None] * R
        for k in range(R):
            r = jnp.sum(jnp.where(row_iota == js[k], X, 0.0), axis=0, keepdims=True)
            for m in range(k):
                r = r - l[k][m] * xr[m]
            xr[k] = r * inv[k]
        xupd = jnp.where(sub > js[0], cT[0], 0.0) * xr[0]
        for k in range(1, R):
            xupd = xupd + jnp.where(sub > js[k], cT[k], 0.0) * xr[k]
        X = X - xupd
        for k in range(R):
            X = jnp.where(row_iota == js[k], xr[k], X)
        return M, LT, X

    _, LT, X = jax.lax.fori_loop(0, SB // R, step, (D, jnp.zeros_like(D), eye))
    return LT.T, X


def _factor_invert_base_r4(D: Array) -> Tuple[Array, Array]:
    return _factor_invert_base_rk(D, 4)


def _factor_invert_base_r8(D: Array) -> Tuple[Array, Array]:
    return _factor_invert_base_rk(D, 8)


def _factor_invert_base_r16(D: Array) -> Tuple[Array, Array]:
    return _factor_invert_base_rk(D, 16)


# Default sequential-pivot rank for the panel kernel's diagonal sub-block
# factorization; measured on v5e-1 at N=10240 (scripts/bench_blocked_chol.py).
_PIVOT_BASES = {1: _factor_invert_base, 2: _factor_invert_base_r2,
                4: _factor_invert_base_r4, 8: _factor_invert_base_r8,
                16: _factor_invert_base_r16}
# Same-session A/B at N=10240/HIGH on v5e-1 (scripts/bench_blocked_chol.py):
# rank-2 = 14.1 ms (25.58 TFLOP/s), rank-4 = 13.9 ms (25.95 TFLOP/s),
# alpha rel err 1.03e-3 vs f64 unchanged.
_DEFAULT_PIVOT_RANK = 4


def _panel_kernel(a_ref, l_ref, linv_ref, *, pivot_rank=_DEFAULT_PIVOT_RANK):
    """Factor one (B, B) SPD block: L (lower Cholesky) and L⁻¹.

    B = NB·128; the Python loop over NB sub-panels is unrolled at trace
    time.  Left-looking: each diagonal sub-block is corrected with MXU
    matmuls over the already-factored columns, then factored+inverted by
    the sequential VPU loop above.
    """
    _factor_base = _PIVOT_BASES[pivot_rank]
    B = a_ref.shape[0]
    NB = B // _SB
    A = a_ref[:]

    # L sub-blocks, indexed [i][s] (i >= s), each (SB, SB)
    Lb = [[None] * NB for _ in range(NB)]
    Xd = [None] * NB  # diagonal-block inverses

    for s in range(NB):
        sl = slice(s * _SB, (s + 1) * _SB)
        D = A[sl, sl]
        for m in range(s):
            D = D - _dot(Lb[s][m], Lb[s][m].T, _HIGHEST)
        Ld, Xs = _factor_base(D)
        Lb[s][s] = Ld
        Xd[s] = Xs
        for i in range(s + 1, NB):
            il = slice(i * _SB, (i + 1) * _SB)
            R = A[il, sl]
            for m in range(s):
                R = R - _dot(Lb[i][m], Lb[s][m].T, _HIGHEST)
            Lb[i][s] = _dot(R, Xs.T, _HIGHEST)

    # triangular inverse off-diagonal blocks:
    #   X[i][s] = -X[i][i] · Σ_{m=s}^{i-1} L[i][m] · X[m][s]
    Xb = [[None] * NB for _ in range(NB)]
    for s in range(NB):
        Xb[s][s] = Xd[s]
        for i in range(s + 1, NB):
            acc = _dot(Lb[i][s], Xb[s][s], _HIGHEST)
            for m in range(s + 1, i):
                acc = acc + _dot(Lb[i][m], Xb[m][s], _HIGHEST)
            Xb[i][s] = -_dot(Xd[i], acc, _HIGHEST)

    zero = jnp.zeros((_SB, _SB), jnp.float32)
    l_ref[:] = jnp.block(
        [[Lb[i][s] if s <= i else zero for s in range(NB)] for i in range(NB)]
    )
    linv_ref[:] = jnp.block(
        [[Xb[i][s] if s <= i else zero for s in range(NB)] for i in range(NB)]
    )


@functools.partial(jax.jit, static_argnames=("interpret", "pivot_rank"))
def factor_panel(
    A: Array,
    interpret: Optional[bool] = None,
    pivot_rank: Optional[int] = None,
) -> Tuple[Array, Array]:
    """(L, L⁻¹) of one (B, B) SPD block, B a multiple of 128.

    One Pallas kernel — the whole panel factorization runs on-core with
    zero dispatch overhead between its B column steps.  ``pivot_rank``
    (1/2/4) selects the sequential elimination width; default measured
    best on v5e-1.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if pivot_rank is None:
        pivot_rank = _DEFAULT_PIVOT_RANK
    B = A.shape[0]
    if B % _SB:
        raise ValueError(f"panel size {B} must be a multiple of {_SB}")
    A = A.astype(jnp.float32)
    out_shape = (
        jax.ShapeDtypeStruct((B, B), jnp.float32),
        jax.ShapeDtypeStruct((B, B), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_panel_kernel, pivot_rank=pivot_rank),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=bool(interpret),
    )(A)


# ---------------------------------------------------------------------------
# Outer blocked algorithm on lower-triangle column panels
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class BlockedCholesky:
    """Lower Cholesky factor held as column panels + diag-block inverses.

    ``panels[k]`` is the (N − k·B, B) slice of L below and including the
    k-th diagonal block; ``linvs`` is (P, B, B) with L_kk⁻¹.  ``n`` is the
    logical (unpadded) dimension — rows/cols beyond it factor an identity
    padding block and are sliced away by :meth:`solve`.
    """

    def __init__(self, panels: Sequence[Array], linvs: Array, n: int):
        self.panels = tuple(panels)
        self.linvs = linvs
        self.n = n

    @property
    def block(self) -> int:
        return self.panels[0].shape[1]

    @property
    def padded_n(self) -> int:
        return self.panels[0].shape[0]

    def tree_flatten(self):
        return (self.panels, self.linvs), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        panels, linvs = children
        return cls(panels, linvs, aux[0])

    # -- dense reconstruction (tests / small N only) ----------------------
    def dense(self) -> Array:
        Np, B = self.padded_n, self.block
        L = jnp.zeros((Np, Np), jnp.float32)
        for k, p in enumerate(self.panels):
            L = L.at[k * B :, k * B : (k + 1) * B].set(p)
        return L[: self.n, : self.n]

    def logdet(self) -> Array:
        """log det K = 2 Σ log diag(L), padding blocks excluded."""
        B = self.block
        total = jnp.asarray(0.0, jnp.float32)
        for k, p in enumerate(self.panels):
            d = jnp.diagonal(p[:B])
            idx = k * B + jnp.arange(B)
            total = total + jnp.sum(jnp.where(idx < self.n, jnp.log(d), 0.0))
        return 2.0 * total

    def _pad_rhs(self, b: Array):
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        pad = self.padded_n - b.shape[0]
        if pad:
            b = jnp.concatenate(
                [b, jnp.zeros((pad, b.shape[1]), b.dtype)], axis=0
            )
        return b.astype(jnp.float32), squeeze

    def _forward(self, b: Array, precision) -> list:
        """y = L⁻¹ b, right-looking: ONE shrinking GEMM per panel (the whole
        sub-diagonal panel hits the remaining RHS at once) instead of
        P²/2 block-by-block updates."""
        B = self.block
        ys = []
        rest = b
        for k, p in enumerate(self.panels):
            yk = _dot(self.linvs[k], rest[:B], precision)
            ys.append(yk)
            if p.shape[0] > B:
                rest = rest[B:] - _dot(p[B:], yk, precision)
        return ys

    def solve(self, b: Array, precision=_HIGHEST) -> Array:
        """(L Lᵀ)⁻¹ b by blocked substitution — GEMMs against the retained
        diag-block inverses instead of triangular-solve custom calls.
        2P GEMMs total (one per panel per sweep)."""
        B = self.block
        P = len(self.panels)
        b, squeeze = self._pad_rhs(b)
        ys = self._forward(b, precision)
        # backward: x_j = L_jj⁻ᵀ (y_j − panels[j][B:]ᵀ · x_below)
        nrhs = b.shape[1]
        below = jnp.zeros((0, nrhs), jnp.float32)
        xs: list = [None] * P
        for j in reversed(range(P)):
            s = ys[j]
            if below.shape[0]:
                s = s - _dot(self.panels[j][B:].T, below, precision)
            xs[j] = _dot(self.linvs[j].T, s, precision)
            below = jnp.concatenate([xs[j], below], axis=0)
        x = below[: self.n]
        return x[:, 0] if squeeze else x

    def solve_lower(self, b: Array, precision=_HIGHEST) -> Array:
        """L⁻¹ b (forward substitution only) — e.g. for whitening k*."""
        b, squeeze = self._pad_rhs(b)
        y = jnp.concatenate(self._forward(b, precision), axis=0)[: self.n]
        return y[:, 0] if squeeze else y


def _split_panels(K: Array, B: int, n: int, diag_pad: float = 1.0) -> list:
    """Lower-triangle column panels of K padded to a multiple of B with an
    identity-scaled diagonal block (padding never couples to real rows)."""
    Np = -(-n // B) * B
    pad = Np - n
    if pad:
        K = jnp.pad(K.astype(jnp.float32), ((0, pad), (0, pad)))
        idx = n + jnp.arange(pad)
        K = K.at[idx, idx].set(diag_pad)
    return [K[k * B :, k * B : (k + 1) * B] for k in range(Np // B)]


def cholesky_panels(
    panels: Sequence[Array],
    n: int,
    precision=_HIGHEST,
    interpret: Optional[bool] = None,
    pivot_rank: Optional[int] = None,
) -> BlockedCholesky:
    """LEFT-looking blocked Cholesky over lower-triangle column panels.

    The Python loop over the P panels is unrolled at trace time, so every
    GEMM has a static shape — but unlike the right-looking form (whose
    P(P−1)/2 trailing updates put ~3200 GEMM HLOs in the N=40960 program
    and ~490 s of compile over the tunnel, VERDICT r4 #3), each panel here
    applies its ENTIRE history correction as ONE
    (Np−kB, kB)·(kB, B) GEMM against the dense lower factor accumulated so
    far: 3 HLOs per panel, O(P) total, identical N³/3 FLOPs (the same
    arithmetic reassociated — the one GEMM accumulates in f32 what the
    right-looking form rounded once per panel update, so accuracy is equal
    or slightly better).  ``precision`` sets the MXU pass count for the
    TRSM/history GEMMs (HIGHEST = 6-pass f32; HIGH = 3-pass bf16x3, ~2×
    faster with near-f32 accuracy); the panel kernel itself is always
    full f32.
    """
    B = panels[0].shape[1]
    P = len(panels)
    Np = panels[0].shape[0]
    # dense lower accumulator for the history GEMMs; every panel writes its
    # slice exactly once, so XLA updates it in place
    Ldense = jnp.zeros((Np, Np), jnp.float32)
    L_panels: list = [None] * P
    linvs: list = [None] * P
    for k in range(P):
        pk = panels[k].astype(jnp.float32)
        if k:
            hist = Ldense[k * B :, : k * B]                 # (Np−kB, kB)
            hist_k = Ldense[k * B : (k + 1) * B, : k * B]   # (B, kB)
            pk = pk - _dot(hist, hist_k.T, precision)
        Lkk, Linv = factor_panel(pk[:B], interpret=interpret, pivot_rank=pivot_rank)
        linvs[k] = Linv
        if pk.shape[0] > B:
            below = _dot(pk[B:], Linv.T, precision)  # TRSM as GEMM
            Lk = jnp.concatenate([Lkk, below], axis=0)
        else:
            Lk = Lkk
        L_panels[k] = Lk
        if k + 1 < P:
            Ldense = jax.lax.dynamic_update_slice(Ldense, Lk, (k * B, k * B))
    return BlockedCholesky(L_panels, jnp.stack(linvs), n)


def cholesky_panels_grouped(
    panels: Sequence[Array],
    n: int,
    precision=_HIGHEST,
    interpret: Optional[bool] = None,
    pivot_rank: Optional[int] = None,
    group: int = 4,
) -> BlockedCholesky:
    """:func:`cholesky_panels` with panels processed in groups of ``group``:
    ONE ``factor_panel`` call site (inside a ``lax.fori_loop``) and ~5 GEMM
    HLOs per *group* instead of per *panel*.

    Why: every unrolled ``pallas_call`` instance costs ~1.3 s of Mosaic
    compile (measured v5e-1, no dedupe across call sites), so the P=80
    program at N=40960 spent ~104 s compiling 80 copies of the identical
    panel kernel plus ~200 s of XLA on 80 unique-shape GEMMs (312 s total,
    VERDICT r4 #3).  Structure per group g (row offset r_g = g·Pg·B,
    height H_g = Np − r_g, width W_g = Pg·B — all static):

    * inter-group history: W ← W − Σ_{g'<g} L_{g'}[r_g−r_{g'}:] ·
      L_{g'}[r_g−r_{g'} : …+W_g]ᵀ — exact FLOPs, G²/2 static GEMMs total;
    * within-group: right-looking ``fori_loop`` over the Pg panels with
      dynamic offsets and full-(H_g, W_g) static GEMM shapes — the only
      FLOPs overhead, ≈ (3/2)·Pg·B/Np of the N³/3 total (7.5% at Pg=4,
      N=40960; measured runtime 440 → ~460 ms against a 312 → <90 s
      compile).

    The returned factor is numerically equivalent (same arithmetic class,
    different GEMM grouping) and API-identical to :func:`cholesky_panels`.
    """
    B = panels[0].shape[1]
    P = len(panels)
    Np = panels[0].shape[0]
    zero = jnp.zeros((), jnp.int32)
    group_starts = list(range(0, P, group))
    Lg_list = []      # per-group (H_g, W_g) factor buffers
    linv_list = []    # per-group (W_g, B) stacked diag-block inverses
    for g0 in group_starts:
        Pg = min(group, P - g0)
        r_g = g0 * B
        Hg = Np - r_g
        Wg = Pg * B
        # group work buffer: the group's panels top-padded to height H_g
        W = jnp.concatenate(
            [
                jnp.concatenate(
                    [jnp.zeros((t * B, B), jnp.float32),
                     panels[g0 + t].astype(jnp.float32)],
                    axis=0,
                )
                for t in range(Pg)
            ],
            axis=1,
        )
        # exact inter-group history correction, one GEMM per earlier group
        for gi, g0p in enumerate(group_starts[: len(Lg_list)]):
            off = r_g - g0p * B
            A = Lg_list[gi][off:]          # (H_g, W_{g'})
            C = Lg_list[gi][off : off + Wg]  # (W_g, W_{g'})
            W = W - _dot(A, C.T, precision)

        lax = jax.lax

        def step(t, carry, Hg=Hg, Wg=Wg):
            W, Lg, linv_g = carry
            off = (t * B).astype(jnp.int32)
            Dblk = lax.dynamic_slice(W, (off, off), (B, B))
            Lkk, Linv = factor_panel(
                Dblk, interpret=interpret, pivot_rank=pivot_rank
            )
            W_pad = jnp.concatenate(
                [W, jnp.zeros((Wg, Wg), jnp.float32)], axis=0
            )
            colblk = lax.dynamic_slice(W_pad, (off, off), (Hg, B))
            below = _dot(colblk[B:], Linv.T, precision)  # TRSM as GEMM
            Lcol = jnp.concatenate([Lkk, below], axis=0)  # rows off…off+H_g
            # shift to group coords (zeros above the diagonal block)
            Lcol_ext = jnp.concatenate(
                [jnp.zeros((Wg, B), jnp.float32), Lcol], axis=0
            )
            Lcol_g = lax.dynamic_slice(
                Lcol_ext, ((Wg - off).astype(jnp.int32), zero), (Hg, B)
            )
            Lg = lax.dynamic_update_slice(Lg, Lcol_g, (zero, off))
            linv_g = lax.dynamic_update_slice(linv_g, Linv, (off, zero))
            # trailing update, full static width (columns left of the
            # diagonal see a zero multiplier row and are untouched)
            W = W - _dot(Lcol_g, Lcol_g[:Wg].T, precision)
            return W, Lg, linv_g

        _, Lg, linv_g = lax.fori_loop(
            0, Pg, step,
            (W, jnp.zeros((Hg, Wg), jnp.float32),
             jnp.zeros((Wg, B), jnp.float32)),
        )
        Lg_list.append(Lg)
        linv_list.append(linv_g)

    L_panels, linvs = [], []
    for gi, g0 in enumerate(group_starts):
        Pg = min(group, P - g0)
        for t in range(Pg):
            L_panels.append(Lg_list[gi][t * B :, t * B : (t + 1) * B])
            linvs.append(linv_list[gi][t * B : (t + 1) * B])
    return BlockedCholesky(L_panels, jnp.stack(linvs), n)


# Above this panel count the unrolled cholesky_panels pays ~1.3 s of
# Mosaic compile per panel (one pallas instance each) — route to the
# grouped form; below it the unrolled form's exact FLOPs win.
_GROUPED_MIN_PANELS = 32


def blocked_cholesky(
    K: Array,
    block: int = 512,
    precision=_HIGHEST,
    interpret: Optional[bool] = None,
) -> BlockedCholesky:
    """Blocked Cholesky of a dense SPD K (N, N); N need not divide block."""
    n = K.shape[0]
    B = min(block, -(-n // _SB) * _SB)
    return cholesky_panels(_split_panels(K, B, n), n, precision, interpret)


# Stationary covariance families on scaled squared distance d² — shared by
# the panel Gram builder here and the fused Pallas predict kernels
# (ops/pallas_gram.py).  The reference's canonical policy-DS kernel is
# C*Matern(ν=2.5)+White (example/2D/surface_generalization.py:49), so the
# fast paths must cover the Matern family, not just RBF (VERDICT r2 #3).
# All of these are elementwise VPU math — identical MXU GEMM structure.
STATIONARY_FAMILIES = ("rbf", "matern12", "matern32", "matern52")

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)


def stationary_from_sqdist(d2: Array, family: str) -> Array:
    """k(d²) for a unit-amplitude stationary family on ℓ-scaled inputs."""
    if family == "rbf":
        return jnp.exp(-0.5 * d2)
    d = jnp.sqrt(d2 + 1e-36)
    if family == "matern12":
        return jnp.exp(-d)
    if family == "matern32":
        s = _SQRT3 * d
        return (1.0 + s) * jnp.exp(-s)
    if family == "matern52":
        s = _SQRT5 * d
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    raise ValueError(f"unknown stationary family {family!r}")


def stationary_gram_panels(
    X: Array,
    lengthscale: Array,
    amplitude,
    noise,
    block: int,
    precision=_HIGHEST,
    family: str = "rbf",
) -> Tuple[list, int]:
    """Lower-triangle column panels of amp·k((x−x′)/ℓ) + noise·I for any
    stationary family, built panel-by-panel — the full (N, N) Gram never
    exists in HBM.

    Padding rows use far-away pseudo-points so their off-diagonal kernel
    values underflow to 0; their diagonal is amp+noise (a positive block
    the factorization consumes and :meth:`BlockedCholesky.solve` ignores).
    """
    n, D = X.shape
    Np = -(-n // block) * block
    ls = jnp.atleast_1d(jnp.asarray(lengthscale)).astype(jnp.float32)
    Z = (X / ls).astype(jnp.float32)
    if Np > n:
        far = 1e6 * (1.0 + jnp.arange(Np - n, dtype=jnp.float32))[:, None]
        Z = jnp.concatenate([Z, jnp.broadcast_to(far, (Np - n, D))], 0)
    amp = jnp.asarray(amplitude, jnp.float32)
    noise = jnp.asarray(noise, jnp.float32)
    panels = []
    for k in range(Np // block):
        rows = Z[k * block :]  # (M_k, D)
        cols = Z[k * block : (k + 1) * block]  # (B, D)
        # d² as per-dimension broadcast differences, unrolled over the small
        # D: one fused VPU pass writing (M_k, B) — the matmul formulation
        # (rows @ cols.T with K=D≈3) wastes the MXU on a padded-to-128
        # contraction and was measured 10 ms of the whole 19 ms pipeline.
        d2 = jnp.zeros((rows.shape[0], block), jnp.float32)
        for dim in range(D):
            diff = rows[:, dim, None] - cols[None, :, dim]
            d2 = d2 + diff * diff
        p = amp * stationary_from_sqdist(d2, family)
        ridx = jnp.arange(p.shape[0])[:, None]
        cidx = jnp.arange(block)[None, :]
        p = jnp.where(ridx == cidx, p + noise, p)
        panels.append(p)
    return panels, n


def rbf_gram_panels(X, lengthscale, amplitude, noise, block, precision=_HIGHEST):
    """Back-compat alias: RBF panels (see :func:`stationary_gram_panels`)."""
    return stationary_gram_panels(
        X, lengthscale, amplitude, noise, block, precision, family="rbf"
    )


def symmetric_matvec_panels(panels: Sequence[Array], x: Array, n: int,
                            precision=_HIGHEST) -> Array:
    """K @ x from lower-triangle column panels of a symmetric K.

    Per panel k: the stored block column contributes P_k · x_k to rows
    k·B…, and its strict sub-diagonal part contributes P_k[B:]ᵀ · x_below
    to rows of block k (the mirrored upper triangle)."""
    B = panels[0].shape[1]
    Np = panels[0].shape[0]
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    pad = Np - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    x = x.astype(jnp.float32)
    y = jnp.zeros_like(x)
    for k, p in enumerate(panels):
        xk = x[k * B : (k + 1) * B]
        y = y.at[k * B :].add(_dot(p, xk, precision))
        if p.shape[0] > B:
            up = _dot(p[B:].T, x[(k + 1) * B :], precision)
            y = y.at[k * B : (k + 1) * B].add(up)
    y = y[:n]
    return y[:, 0] if squeeze else y


def gram_cholesky_solve(
    X: Array,
    Y: Array,
    lengthscale: Array,
    amplitude,
    noise,
    block: int = 512,
    precision=_HIGHEST,
    interpret: Optional[bool] = None,
    refine_iters: Optional[int] = None,
    family: str = "rbf",
    pivot_rank: Optional[int] = None,
    group: Optional[int] = None,
) -> Tuple[Array, BlockedCholesky]:
    """Fused K=k(X,X)+σ²I → blocked Cholesky → α = K⁻¹Y.

    The whole pipeline is custom-call-free: Gram panels and TRSM/SYRK run
    on the MXU, panel factorizations in one Pallas kernel each, and the
    solve is blocked substitution with the retained diag-block inverses.

    ``refine_iters`` steps of f32 iterative refinement
    (α ← α + K⁻¹(Y − Kα), residual at HIGHEST precision) restore the
    solve to plain-f32 accuracy when the TRSM/SYRK GEMMs ran at HIGH
    (bf16x3): measured at N=10240 the raw HIGH factor gives rel err 8e-3
    vs f64 while one refinement step recovers the builtin-f32 level
    (~1e-3) for ~1 ms.

    ``group`` (None = auto): above ``_GROUPED_MIN_PANELS`` panels the
    factorization routes to :func:`cholesky_panels_grouped` so compile
    time stays O(panels/group) pallas instances (VERDICT r4 #3).

    ``refine_iters`` None = auto: 1, or 2 from 32 panels up — the
    left-looking history GEMM's bf16x3 error grows with its K dimension
    (measured HIGH refine=1 residuals: 1e-3 at N=10240, 9.5e-3 at 20480,
    1.2e-2 at 40960; one extra refinement restores ~1e-3 for ~10% of the
    runtime at 20480 and ~4% at 40960)."""
    panels, n = stationary_gram_panels(
        X, lengthscale, amplitude, noise, block, precision, family
    )
    if refine_iters is None:
        refine_iters = 1 if len(panels) < _GROUPED_MIN_PANELS else 2
    if group is None and len(panels) >= _GROUPED_MIN_PANELS:
        group = 4
    if group:
        chol = cholesky_panels_grouped(
            panels, n, precision, interpret, pivot_rank, group=group
        )
    else:
        chol = cholesky_panels(panels, n, precision, interpret, pivot_rank)
    squeeze = Y.ndim == 1
    Y2 = Y[:, None] if squeeze else Y
    alpha = chol.solve(Y2, precision)
    for _ in range(refine_iters):
        resid = Y2.astype(jnp.float32) - symmetric_matvec_panels(
            panels, alpha, n, _HIGHEST
        )
        alpha = alpha + chol.solve(resid, precision)
    return (alpha[:, 0] if squeeze else alpha), chol
