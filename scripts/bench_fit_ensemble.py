"""Batched full-hyperopt ensemble fits on the real chip.

Compares, at the transport-residual workload (per-member n=20 datasets,
C·RBF(2)+White, R restarts, maxiter L-BFGS iterations):
  A. vmapped fit_jit        (optax L-BFGS over the custom-VJP small LML —
                             the r3 path, ~1.1k fits/s)
  B. fit_ensemble_fused     (E-last batched L-BFGS over the fused
                             multi-data Pallas LML kernel)

Usage: timeout 900 python scripts/bench_fit_ensemble.py [E]
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

from gaussian_process_transportation_tpu import kernels as K
from gaussian_process_transportation_tpu.models import exact_gp as core


def log(*a):
    print(*a, file=sys.stderr, flush=True)


E = int(sys.argv[1]) if len(sys.argv) > 1 else 256
n, D = 20, 2
rng = np.random.default_rng(0)
Xe = jnp.asarray(rng.standard_normal((E, n, D)).astype(np.float32))
Ye = jnp.asarray(
    (np.sin(np.asarray(Xe)[:, :, :1]) + 0.1 * rng.standard_normal((E, n, 1))).astype(np.float32)
)
kernel = (
    K.Constant(1.0, bounds=(1e-2, 1e2))
    * K.RBF(jnp.ones(D, jnp.float32), bounds=(1e-1, 1e2))
    + K.White(0.1, bounds=(1e-4, 1.0))
)
R, MAXITER = 2, 25  # the r3-comparable config (25-iter LBFGS x2 starts)


def timed(f, label, reps=3):
    t0 = time.perf_counter()
    out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
    log(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f()
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    log(f"{label}: {dt*1e3:.0f} ms -> {E/dt:.0f} fits/s  reps {[f'{t*1e3:.0f}' for t in ts]}")
    return out, dt


# B first (it warms fast)
fB = jax.jit(lambda: core.fit_ensemble_fused(
    kernel, Xe, Ye, n_restarts=R, maxiter=MAXITER, key=jax.random.PRNGKey(0)))
outB, dtB = timed(fB, f"B fused-batched (R={R}, maxiter={MAXITER})")

# A: vmapped fit_jit thetas (condition step excluded for both)
def one(x, y):
    # inline fit_jit's optimizer loop (vmap-safe: no NaN filter)
    bounds = kernel.theta_bounds
    theta0 = kernel.theta
    import optax
    u = jax.random.uniform(jax.random.PRNGKey(0), (R, theta0.size), dtype=theta0.dtype)
    starts = jnp.concatenate([theta0[None], bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])], 0)

    def nll(theta):
        v = -core.log_marginal_likelihood(kernel.with_theta(theta), x, y, 1e-10)
        return jnp.where(jnp.isfinite(v), v, 1e25)

    opt = optax.lbfgs()

    def run_one(t0):
        state0 = opt.init(t0)

        def step(carry, _):
            theta, state = carry
            v, g = jax.value_and_grad(nll)(theta)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, theta, value=v, grad=g, value_fn=nll)
            theta = optax.apply_updates(theta, updates)
            theta = jnp.clip(theta, bounds[:, 0], bounds[:, 1])
            return (theta, state), v

        (theta, _), _ = jax.lax.scan(step, (t0, state0), None, length=MAXITER)
        return theta, nll(theta)

    thetas, vals = jax.vmap(run_one)(starts)
    b = jnp.argmin(vals)
    return thetas[b], -vals[b]


fA = jax.jit(lambda: jax.vmap(one)(Xe, Ye))
outA, dtA = timed(fA, f"A vmapped-AD    (R={R}, maxiter={MAXITER})")

lmlA = np.asarray(outA[1])
lmlB = np.asarray(outB[1])
log(f"quality: mean LML A {lmlA.mean():.3f} vs B {lmlB.mean():.3f}; "
    f"B-worse-than-A by >0.5 nats on {np.mean(lmlB < lmlA - 0.5)*100:.1f}% of members; "
    f"B better on {np.mean(lmlB > lmlA + 1e-3)*100:.1f}%")
log(f"speedup: {dtA/dtB:.1f}x")
