"""Ensemble-last (E-last) linear algebra for huge batches of tiny matrices.

TPU tiles pad the two minormost axes of every buffer to (8, 128).  A vmapped
``jnp.linalg.cholesky`` over (E, n, n) with n≈20 therefore moves ~8× the
useful bytes and runs a sequential custom call; with the ensemble axis E
minormost instead, every step of an *unrolled* factorization is a plain
elementwise op over perfectly-packed (…, E) vectors on the VPU.

Used by the batched transport engine (``transport/gpt.py``) for the
fit stage of E≈10⁴-member ensembles of N≈20-point GPs, where this layout
is ~20× cheaper than the vmapped custom-call path (measured on v5e).

Only sensible for small static n (ops are unrolled in Python: O(n²) fused
ops, O(n³/6·E) scalar work) — callers should fall back to
``jnp.linalg.cholesky`` for n ≳ 64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cholesky_elast(K: Array) -> Array:
    """Lower Cholesky of K (n, n, E) — one (n,n) SPD matrix per lane slot.

    Left-looking column algorithm, unrolled over the static n."""
    n = K.shape[0]
    cols = []  # cols[j]: (n, E) = column j of L (zeros above the diagonal)
    for j in range(n):
        v = K[:, j]  # (n, E)
        for k in range(j):
            v = v - cols[k][j][None, :] * cols[k]
        inv_sqrt = jax.lax.rsqrt(v[j])
        col = v * inv_sqrt[None, :]
        if j > 0:
            col = jnp.concatenate([jnp.zeros_like(col[:j]), col[j:]], axis=0)
        cols.append(col)
    return jnp.stack(cols, axis=1)  # (n, n, E)


def inv_lower_elast(L: Array) -> Array:
    """Inverse of a lower-triangular L (n, n, E) by unrolled forward
    substitution (columns of L⁻¹ solve L x = e_j)."""
    n = L.shape[0]
    inv_diag = 1.0 / jnp.einsum("iie->ie", L)  # (n, E)
    zero = jnp.zeros_like(L[0, 0])  # (E,)
    cols = []
    for j in range(n):
        rows = [zero] * j  # rows above j are zero
        rows.append(inv_diag[j])
        for i in range(j + 1, n):
            s = zero
            for k in range(j, i):
                s = s + L[i, k] * rows[k]
            rows.append(-s * inv_diag[i])
        cols.append(jnp.stack(rows, axis=0))  # (n, E)
    return jnp.stack(cols, axis=1)  # (n, n, E)


def spd_inverse_elast(K: Array) -> tuple[Array, Array]:
    """(L, K⁻¹) of SPD K (n, n, E): K⁻¹ = L⁻ᵀ L⁻¹, all E-last."""
    L = cholesky_elast(K)
    Li = inv_lower_elast(L)
    K_inv = jnp.einsum("kie,kje->ije", Li, Li)
    return L, K_inv


def cho_solve_elast(L: Array, B: Array) -> Array:
    """Solve (L Lᵀ) X = B with L (n, n, E), B (n, p, E) — unrolled forward
    then backward substitution, all elementwise over E."""
    n = L.shape[0]
    inv_diag = 1.0 / jnp.einsum("iie->ie", L)  # (n, E)
    # forward: L z = B
    z = []
    for i in range(n):
        s = B[i]  # (p, E)
        for k in range(i):
            s = s - L[i, k][None, :] * z[k]
        z.append(s * inv_diag[i][None, :])
    # backward: Lᵀ x = z
    x = [None] * n
    for i in reversed(range(n)):
        s = z[i]
        for k in range(i + 1, n):
            s = s - L[k, i][None, :] * x[k]
        x[i] = s * inv_diag[i][None, :]
    return jnp.stack(x, axis=0)  # (n, p, E)


# ---------------------------------------------------------------------------
# custom_vmap wrappers: unbatched calls use the LAPACK-style custom calls;
# any vmapped call re-lays the batch ensemble-last and runs the unrolled
# kernels above.  NOTE: these do not support differentiation *through* the
# op — wrap consumers in jax.custom_vjp with analytic gradients (see
# models/exact_gp.py log-marginal-likelihood).
# ---------------------------------------------------------------------------

from jax.custom_batching import custom_vmap


@custom_vmap
def small_cholesky(K: Array) -> Array:
    """Lower Cholesky of one small (n ≲ 64) SPD matrix; under vmap, huge
    batches run ensemble-last on the VPU with zero tile padding."""
    return jnp.linalg.cholesky(K)


@small_cholesky.def_vmap
def _small_cholesky_vmap(axis_size, in_batched, K):
    (kb,) = in_batched
    if not kb:
        K = jnp.broadcast_to(K[None], (axis_size,) + K.shape)
    L = cholesky_elast(jnp.moveaxis(K, 0, -1))
    return jnp.moveaxis(L, -1, 0), True


@custom_vmap
def small_cho_solve(L: Array, B: Array) -> Array:
    """(L Lᵀ)⁻¹ B for one small factorization; batch goes ensemble-last."""
    y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@small_cho_solve.def_vmap
def _small_cho_solve_vmap(axis_size, in_batched, L, B):
    lb, bb = in_batched
    if not lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not bb:
        B = jnp.broadcast_to(B[None], (axis_size,) + B.shape)
    X = cho_solve_elast(jnp.moveaxis(L, 0, -1), jnp.moveaxis(B, 0, -1))
    return jnp.moveaxis(X, -1, 0), True
