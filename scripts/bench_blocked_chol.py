"""Measure the Pallas-panel blocked Cholesky on the real TPU chip.

Usage: python scripts/bench_blocked_chol.py [N] [block] [precision] [family]
family ∈ {rbf, matern12, matern32, matern52} (default rbf).
Prints accuracy vs f64 CPU golden and TFLOP/s for ours vs the XLA builtin.
Timing forces a host transfer (np.asarray) — block_until_ready does not
synchronize over the axon tunnel (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 512
PREC_NAME = sys.argv[3] if len(sys.argv) > 3 else "highest"
PREC = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}[PREC_NAME]
FAMILY = sys.argv[4] if len(sys.argv) > 4 else "rbf"
# 15 (not 5): at ITERS=5 per-rep fixed costs under-amortize over the
# tunnel and inflate ms/iter ~25% (the retracted 18.0 TFLOP/s Matern
# figure was exactly this)
ITERS = int(os.environ.get("ITERS", "15"))
# sequential pivot rank of the panel kernel (1/2/4); empty = package default
PIVOT = os.environ.get("PIVOT_RANK")
PIVOT = int(PIVOT) if PIVOT else None

jax.config.update("jax_default_matmul_precision", "highest")

from gaussian_process_transportation_tpu.ops.blocked_chol import gram_cholesky_solve
from gaussian_process_transportation_tpu.ops.linalg import add_diagonal, cho_solve_lower

print(f"N={N} block={BLOCK} precision={PREC_NAME} family={FAMILY} "
      f"backend={jax.default_backend()}", flush=True)


def _np_kernel(D2):
    """f64 golden kernel value from squared distance (matches FAMILY)."""
    if FAMILY == "rbf":
        return np.exp(-0.5 * D2)
    d = np.sqrt(D2)
    if FAMILY == "matern12":
        return np.exp(-d)
    if FAMILY == "matern32":
        s = np.sqrt(3.0) * d
        return (1.0 + s) * np.exp(-s)
    s = np.sqrt(5.0) * d
    return (1.0 + s + s * s / 3.0) * np.exp(-s)

rng = np.random.default_rng(0)
X = rng.standard_normal((N, 3)).astype(np.float32)
Y = rng.standard_normal((N, 3)).astype(np.float32)
ls = np.array([1.0, 1.0, 1.0], np.float32)
amp, noise = 2.0, 0.1

# f64 golden on CPU (skippable: SKIP_GOLDEN=1 for timing-only runs)
a64 = None
if not int(os.environ.get("SKIP_GOLDEN", "0")):
    t0 = time.perf_counter()
    X64 = X.astype(np.float64)
    sq = (X64 * X64).sum(1)
    D2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X64 @ X64.T), 0.0)
    K64 = amp * _np_kernel(D2) + noise * np.eye(N)
    a64 = np.linalg.solve(K64, Y.astype(np.float64))
    print(f"golden f64 solve: {time.perf_counter()-t0:.1f}s", flush=True)
    del D2, K64

Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
lsd = jnp.asarray(ls)

fused = jax.jit(lambda Xs, Ys: gram_cholesky_solve(
    Xs, Ys, lsd, amp, noise, block=BLOCK, precision=PREC, interpret=False,
    family=FAMILY, pivot_rank=PIVOT)[0])

t0 = time.perf_counter()
alpha = np.asarray(fused(Xd, Yd))
print(f"ours compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
if a64 is not None:
    err = np.abs(alpha - a64).max() / np.abs(a64).max()
    print(f"ours alpha rel err vs f64: {err:.2e}", flush=True)
else:
    # dense-golden-free validation for very large N: device-side residual
    # ||K a - y||_inf / ||y||_inf through the panel matvec (no (N,N) buffer)
    from gaussian_process_transportation_tpu.ops.blocked_chol import (
        stationary_gram_panels, symmetric_matvec_panels)

    @jax.jit
    def _residual(Xs, Ys, a):
        panels, nn = stationary_gram_panels(
            Xs, lsd, amp, noise, block=BLOCK, precision=PREC, family=FAMILY)
        # diagnostic matvec at HIGHEST regardless of PREC: a bf16x3 (HIGH)
        # matvec has its own ~1e-2 error floor at these K dims and masks
        # the true solve residual (measured r5: 1.0e-2 "residual" at
        # N=20480 where the HIGHEST matvec shows the real 5.0e-4)
        r = symmetric_matvec_panels(
            panels, a, nn, precision=jax.lax.Precision.HIGHEST) - Ys
        return jnp.abs(r).max() / jnp.abs(Ys).max()

    print(f"residual |K a - y|/|y| (device, panel matvec): "
          f"{float(np.asarray(_residual(Xd, Yd, jnp.asarray(alpha)))):.2e}",
          flush=True)

flops = 2 * N * N * 3 + N**3 / 3 + 4 * N * N * 3

def timed(fn, reps=3):
    """Queue ITERS async dispatches, sync once with a host transfer (the
    tunnel adds ~30 ms per sync; amortize it over the batch)."""
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        np.asarray(out)  # outputs here are small (scalar or one row)
        best.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(best)), best


dt, allt = timed(lambda: fused(Xd, Yd)[0])
tflops = flops / dt / 1e12
print(f"ours: {dt*1e3:.1f} ms/iter median of {[f'{t*1e3:.0f}' for t in allt]} "
      f"-> {tflops:.2f} TFLOP/s", flush=True)

# honest roofline pair (VERDICT r2 #4): achieved TFLOP/s over BOTH the
# f32-HIGHEST and the HIGH (bf16x3) matmul roofline, measured on-chip
if not int(os.environ.get("SKIP_ROOFLINE", "0")):
    m = 8192
    a_rf = jnp.full((m, m), 1e-3, jnp.float32)
    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH)):
        mm = jax.jit(lambda x, p=prec: jnp.dot(x, x, precision=p))
        np.asarray(mm(a_rf)[0, 0])
        # sync on a scalar slice — never pull the 268 MB product over the tunnel
        rdt, _ = timed(lambda: mm(a_rf)[0, 0], reps=2)
        roof = 2 * m**3 / rdt / 1e12
        print(f"matmul roofline {name}: {roof:.1f} TFLOP/s; "
              f"achieved = {100*tflops/roof:.0f}%", flush=True)

# builtin comparison (skippable: SKIP_BUILTIN=1)
if int(os.environ.get("SKIP_BUILTIN", "0")):
    sys.exit(0)
kern_amp, kern_noise = amp, noise


from gaussian_process_transportation_tpu.ops.blocked_chol import stationary_from_sqdist


@jax.jit
def builtin(Xs, Ys):
    sqd = jnp.sum(Xs * Xs, 1)
    d2 = jnp.maximum(sqd[:, None] + sqd[None, :] - 2 * Xs @ Xs.T, 0.0)
    Km = add_diagonal(kern_amp * stationary_from_sqdist(d2, FAMILY), kern_noise)
    L = jnp.linalg.cholesky(Km)
    return cho_solve_lower(L, Ys)


t0 = time.perf_counter()
ab = np.asarray(builtin(Xd, Yd))
print(f"builtin compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
if a64 is not None:
    print(f"builtin alpha rel err vs f64: {np.abs(ab - a64).max()/np.abs(a64).max():.2e}",
          flush=True)
print(f"ours vs builtin alpha rel diff: {np.abs(alpha - ab).max()/np.abs(ab).max():.2e}",
      flush=True)
dt, allt = timed(lambda: builtin(Xd, Yd)[0])
print(f"builtin: {dt*1e3:.1f} ms/iter median of {[f'{t*1e3:.0f}' for t in allt]} "
      f"-> {flops/dt/1e12:.2f} TFLOP/s", flush=True)
