"""HMC cost model + fused-path throughput on the real chip (VERDICT r3 #1).

Measures, at the bench workload (n=20 data, C·RBF(2)+White → T=4 thetas,
48 warmup + 48 samples, 16 leapfrog):
  1. per-leapfrog-step time of the fused ensemble-last path at several E
     (separates sequential-latency-bound from throughput-bound),
  2. end-to-end sample_gp_posterior samples/s (the bench.py hmc stage
     definition) through the fused path.

Usage: timeout 900 python scripts/bench_hmc_fused.py [E ...]
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
from gaussian_process_transportation_tpu.ops.fused_lml import small_lml_value_grad
from gaussian_process_transportation_tpu.parallel import samplers


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def workload(n_data=20):
    rng = np.random.default_rng(0)
    Xs = jnp.asarray(rng.standard_normal((n_data, 2)).astype(np.float32))
    Ys = jnp.asarray(
        (np.sin(np.asarray(Xs)[:, :1]) + 0.1 * rng.standard_normal((n_data, 1))).astype(
            np.float32
        )
    )
    return Xs, Ys


def bench_kernel_steps(Xs, Ys, E, n_steps=256, reps=3):
    """Sequential chain of n_steps fused LML value+grad calls at width E —
    the leapfrog inner loop stripped of everything else."""
    rng = np.random.default_rng(1)
    th0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(4, E)).astype(np.float32))

    @jax.jit
    def chain(th):
        def body(t, _):
            v, g = small_lml_value_grad(Xs, Ys, t, family="rbf", n_ls=2)
            return t + 1e-6 * g, v[0]

        t, vs = jax.lax.scan(body, th, None, length=n_steps)
        return t, vs

    out = chain(th0)
    np.asarray(out[0][0, 0])  # sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(th0)
        np.asarray(out[0][0, 0])
        times.append((time.perf_counter() - t0) / n_steps)
    us = np.median(times) * 1e6
    log(f"E={E:6d}: {us:8.1f} us/step  ({us/E*1000:7.2f} ns/chain/step)  "
        f"reps(us) {[f'{t*1e6/1:.0f}' for t in np.asarray(times)*0+np.asarray(times)*1e0*1e6/1]}")
    return us


def bench_e2e(Xs, Ys, num_chains=256, reps=3, algorithm="hmc", **kw):
    kernel = K.Constant(1.0) * K.RBF(jnp.ones(2, jnp.float32)) + K.White(0.01)
    t0 = time.perf_counter()
    s, d = samplers.sample_gp_posterior(
        kernel, Xs, Ys, jax.random.PRNGKey(0),
        num_chains=num_chains, num_warmup=48, num_samples=48,
        algorithm=algorithm, **kw,
    )
    np.asarray(s[0, 0])
    log(f"e2e compile+first: {time.perf_counter()-t0:.1f}s  "
        f"rhat_max={float(np.max(np.asarray(d['rhat']))):.3f}  "
        f"acc={float(np.mean(np.asarray(d['mean_accept']))):.2f}")
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        s, _ = samplers.sample_gp_posterior(
            kernel, Xs, Ys, jax.random.PRNGKey(1 + rep),
            num_chains=num_chains, num_warmup=48, num_samples=48,
            algorithm=algorithm, **kw,
        )
        np.asarray(s[0, 0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    rate = num_chains * 48 / dt
    log(f"e2e {algorithm} C={num_chains}: reps(s) {[f'{t:.2f}' for t in times]} "
        f"-> {rate:.0f} samples/s")
    return rate


if __name__ == "__main__":
    Es = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096, 16384]
    Xs, Ys = workload()
    log(f"backend: {jax.default_backend()}")
    for E in Es:
        bench_kernel_steps(Xs, Ys, E)
    for C in (256, 4096):
        bench_e2e(Xs, Ys, num_chains=C)
    # fused batched NUTS (VERDICT r4 #5): measured v5e-1 r5 — 106.9k
    # samples/s at C=256/max_depth=6, 61.6k at max_depth=8 (vs 570-640 for
    # the generic vmapped-AD NUTS), target ≥50k
    for md in (6, 8):
        bench_e2e(Xs, Ys, num_chains=256, algorithm="nuts", max_depth=md)
