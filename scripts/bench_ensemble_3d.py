"""Ensemble transport at the reference's 3D scale (VERDICT r3 #4).

The reference's 3D workload fits 2,500-point distributions
(``example/3D/surface_generalization_3D.py:50-51``); under an ensemble the
current ``fit_and_transport_batched`` falls back to vmapping a dense
``jnp.linalg.cholesky`` per member — the documented TPU anti-pattern
(vmapped big-chol custom calls serialize AND tile-pad).  This script
measures, at N=2500 / D=3 / E members on the real chip:

  A. vmapped fit_and_transport            (the as-is fallback)
  B. lax.scan over members, dense path    (same custom calls, unbatched)
  C. lax.scan over members, Pallas panels (condition_blocked, block=512)

Usage: timeout 1200 python scripts/bench_ensemble_3d.py [E] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_default_matmul_precision", "highest")

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.models import exact_gp as gp_core
from gaussian_process_transportation_tpu.models import affine as affine_core
from gaussian_process_transportation_tpu.transport import gpt as gpt_mod

E = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
NQ = 1000
D = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
S = rng.standard_normal((N, D)).astype(np.float32) * 2.0
shifts = np.linspace(0.0, 1.0, E, dtype=np.float32)
targets = (S[None] + shifts[:, None, None]
           + 0.05 * rng.standard_normal((E, N, D)).astype(np.float32))
X = rng.standard_normal((NQ, D)).astype(np.float32) * 2.0
dX = np.zeros_like(X)
dX[:-1] = np.diff(X, axis=0)

kernel = K.Constant(2.0) * K.RBF(2.0 * jnp.ones(D, jnp.float32)) + K.White(0.01)
Sd, Xd, dXd = jnp.asarray(S), jnp.asarray(X), jnp.asarray(dX)
T = jnp.asarray(targets)


def timed(f, args, label, iters=3, reps=3):
    t0 = time.perf_counter()
    out = f(*args)
    s = np.asarray(jax.tree_util.tree_leaves(out)[0][..., 0].ravel()[0])
    log(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    assert np.isfinite(s), label
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., 0].ravel()[0])
        ts.append((time.perf_counter() - t0) / iters)
    ms = float(np.median(ts)) * 1e3
    log(f"{label}: {ms:.1f} ms/ensemble ({ms/E:.1f} ms/member) "
        f"reps {[f'{t*1e3:.0f}' for t in ts]}")
    return ms, out


# A. the round-3 fallback: vmapped dense per-member (kept explicit — the
# production fit_and_transport_batched now routes to C below)
fA = jax.jit(
    lambda tg: jax.vmap(
        lambda t: gpt_mod.fit_and_transport(kernel, Sd, t, Xd, dXd)
    )(tg)
)
msA, outA = timed(fA, (T,), "A vmapped-dense    ")


# B. scan over members, dense per-member path
@jax.jit
def fB(tg):
    def step(_, t):
        return None, gpt_mod.fit_and_transport(kernel, Sd, t, Xd, dXd)

    _, res = jax.lax.scan(step, None, tg)
    return res


msB, outB = timed(fB, (T,), "B scan-dense       ")


# C. scan over members, Pallas-panel conditioning
@jax.jit
def fC(tg):
    def step(_, t):
        aff = affine_core.fit(Sd, t, do_scale=False, do_rotation=True)
        src_al = affine_core.predict(aff, Sd)
        delta = t - src_al
        gp = gp_core.condition_blocked(kernel, src_al, delta, block=512)
        return None, gpt_mod.transport_apply(aff, gp, Xd, dXd)

    _, res = jax.lax.scan(step, None, tg)
    return res


msC, outC = timed(fC, (T,), "C scan-blocked(512)")

# D. the production route (fit_and_transport_batched -> scan-blocked)
fD = jax.jit(lambda tg: gpt_mod.fit_and_transport_batched(kernel, Sd, tg, Xd, dXd))
msD, outD = timed(fD, (T,), "D production-route ")

for name, out in (("B", outB), ("C", outC), ("D", outD)):
    err = float(jnp.max(jnp.abs(out.traj - outA.traj)))
    scale = float(jnp.max(jnp.abs(outA.traj)))
    log(f"{name} vs A traj rel err: {err/scale:.2e}")

best = min((msA, "A"), (msB, "B"), (msC, "C"))
log(f"winner: {best[1]} at {best[0]:.1f} ms/ensemble "
    f"({E / (best[0]/1e3):.1f} members/s)")
