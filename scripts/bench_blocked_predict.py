"""Large-N variance predict: panel factor vs dense-L path, on the real chip.

VERDICT r2 #2 'Done' criterion: large-N (>=4096) variance predicts through
the panel factor must match f64 within the f32 conditioning limit AND beat
the dense path, with no (N, N) dense L materialized.

Usage: python scripts/bench_blocked_predict.py [N] [Nq]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
ITERS = int(os.environ.get("ITERS", "5"))

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.models import exact_gp as eg
from gaussian_process_transportation_tpu.ops.linalg import add_diagonal, cho_solve_lower

print(f"N={N} Nq={NQ} backend={jax.default_backend()}", flush=True)
rng = np.random.default_rng(0)
X = rng.standard_normal((N, 3)).astype(np.float32)
Y = np.sin(X[:, :2]).astype(np.float32)
Xq = rng.standard_normal((NQ, 3)).astype(np.float32)
amp, noise = 2.0, 0.1
kern = K.Constant(amp) * K.RBF(jnp.ones(3, jnp.float32)) + K.White(noise)
Xd, Yd, Xqd = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Xq)


def timed(fn, sync, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(ts)), ts


# ---- panel-factor path (production condition() route at this N) ----
# jit the whole conditioning: eager panel-by-panel execution pays a tunnel
# RPC per GEMM (minutes); one jitted program compiles once
cond_b = jax.jit(lambda Xs, Ys: eg.condition_blocked(kern, Xs, Ys, jitter=1e-6,
                                                     interpret=False))
t0 = time.perf_counter()
gp_b = cond_b(Xd, Yd)
np.asarray(gp_b.alpha[0])
print(f"blocked condition compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
assert gp_b.L is None
pred_b = jax.jit(lambda xq: eg.predict(gp_b, xq, return_std=True))
t0 = time.perf_counter()
m_b, s_b = pred_b(Xqd)
m_b0 = np.asarray(m_b[0]); print(f"blocked predict compile: {time.perf_counter()-t0:.1f}s", flush=True)
dt_b, all_b = timed(lambda: pred_b(Xqd), lambda o: np.asarray(o[1][0, 0]))
print(f"blocked predict(std): {dt_b*1e3:.1f} ms/iter {['%.0f' % (t*1e3) for t in all_b]}", flush=True)

# ---- dense-L path (what r2 shipped: re-densified factor + tri-solves) ----
@jax.jit
def cond_dense(Xs, Ys):
    Km = add_diagonal(kern(Xs), 1e-6)
    L = jnp.linalg.cholesky(Km)
    alpha = cho_solve_lower(L, Ys)
    return L, alpha

t0 = time.perf_counter()
L_d, alpha_d = cond_dense(Xd, Yd)
np.asarray(L_d[0, 0])
print(f"dense condition compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
gp_d = eg.ExactGP(kernel=kern, X=Xd, Y=Yd, alpha=alpha_d, L=L_d, jitter=1e-6)
pred_d = jax.jit(lambda xq: eg.predict(gp_d, xq, return_std=True))
t0 = time.perf_counter()
m_d, s_d = pred_d(Xqd)
np.asarray(m_d[0])
print(f"dense predict compile: {time.perf_counter()-t0:.1f}s", flush=True)
dt_d, all_d = timed(lambda: pred_d(Xqd), lambda o: np.asarray(o[1][0, 0]))
print(f"dense   predict(std): {dt_d*1e3:.1f} ms/iter {['%.0f' % (t*1e3) for t in all_d]}", flush=True)
print(f"speedup blocked/dense: {dt_d/dt_b:.2f}x", flush=True)

# ---- f64 golden (CPU) ----
if not int(os.environ.get("SKIP_GOLDEN", "0")):
    X64, Xq64 = X.astype(np.float64), Xq.astype(np.float64)
    d2 = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
    K64 = amp * np.exp(-0.5 * d2) + (noise + 1e-6) * np.eye(N)
    ks = amp * np.exp(-0.5 * ((Xq64[:, None, :] - X64[None, :, :]) ** 2).sum(-1))
    del d2
    sol = np.linalg.solve(K64, np.concatenate([Y.astype(np.float64), ks.T], 1))
    mean64 = ks @ sol[:, :2]
    std64 = np.sqrt(np.maximum((amp + noise) - np.sum(ks * sol[:, 2:].T, 1), 0.0))
    for name, (m, s) in (("blocked", (m_b, s_b)), ("dense", (m_d, s_d))):
        m, s = np.asarray(m), np.asarray(s)
        em = np.abs(m - mean64).max() / np.abs(mean64).max()
        es = np.abs(s - std64[:, None]).max() / max(np.abs(std64).max(), 1e-12)
        print(f"{name}: mean rel err {em:.2e}, std rel err {es:.2e}", flush=True)
