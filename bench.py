"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "transported_trajectories_per_s_per_chip", "value": N,
   "unit": "traj/s/chip", "vs_baseline": R}

Workload: the canonical 2D transport (N_traj=400, 20-point distributions,
reference example/2D/surface_generalization.py scale) as a batched ensemble
of E independent fit+transport problems — one jitted vmapped program per
iteration on the default backend (the real TPU chip under the driver).

``vs_baseline`` is the measured speedup over the reference *algorithm*
(sklearn GPR + numpy Kabsch pipeline with fixed hyperparameters — the same
math our pipeline runs) executing the same transports one-by-one on CPU,
i.e. ours(traj/s) / reference(traj/s).

Secondary diagnostics (stderr): large-N Cholesky+solve TFLOP/s — the
single-chip roofline driver for ≥10k-point exact GPs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _np_resample(curve, num_points):
    """Numpy arc-length resample — keeps workload prep off the device (the
    TPU tunnel can stall for minutes; the bench must not touch it before
    the measured section)."""
    curve = np.asarray(curve, np.float64)
    seg = np.linalg.norm(np.diff(curve, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    targets = np.linspace(0.0, cum[-1], num_points)
    return np.stack(
        [np.interp(targets, cum, curve[:, d]) for d in range(curve.shape[1])], axis=1
    )


def make_workload(dtype=np.float32, n_traj=400, n_dist=20):
    ref = "/root/reference/example/2D/data/example.npz"
    if os.path.exists(ref):
        data = np.load(ref)
        X = np.asarray(_np_resample(data["demo"], n_traj), dtype)
        S = np.asarray(_np_resample(data["floor"], n_dist), dtype)
        S1 = np.asarray(_np_resample(data["newfloor"], n_dist), dtype)
    else:
        t = np.linspace(0, 1, n_traj, dtype=dtype)
        X = np.stack([10 * t, 5 * np.sin(3 * t)], 1)
        s = np.linspace(0, 1, n_dist, dtype=dtype)
        S = np.stack([10 * s, -2 + 0 * s], 1)
        S1 = np.stack([10 * s, -2 + 3 * np.sin(2 * s)], 1)
    dX = np.zeros_like(X)
    dX[:-1] = np.diff(X, axis=0)
    return X, dX, S, S1


def bench_reference_cpu(X, dX, S, S1, iters=5):
    """The reference pipeline (sklearn GPR, fixed hyperparams) — baseline."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel, ConstantKernel as C

    X = X.astype(np.float64)
    dX = dX.astype(np.float64)
    S = S.astype(np.float64)
    S1 = S1.astype(np.float64)

    def one(shift):
        tgt = S1 + shift
        cs, ct = S.mean(0), tgt.mean(0)
        H = (S - cs).T @ (tgt - ct)
        U, _, Vt = np.linalg.svd(H)
        V = Vt.T
        R = V @ U.T
        if np.linalg.det(R) < 0:
            V[:, -1] *= -1
            R = V @ U.T
        gamma = lambda x: (R @ (x - cs).T).T + ct
        Sg = gamma(S)
        delta = tgt - Sg
        sk = C(10.0) * RBF([4.0, 4.0]) + WhiteKernel(0.01)
        g = GaussianProcessRegressor(kernel=sk, alpha=1e-10, optimizer=None)
        g.fit(Sg, delta)
        Xg = gamma(X)
        mean, std = g.predict(Xg, return_std=True)
        # velocity transport (reference gaussian_process.py:63-101)
        K_ = sk(Sg) + 1e-10 * np.eye(len(Sg))
        K_inv = np.linalg.inv(K_)
        alfa = K_inv @ delta
        k_star = sk(Xg, Sg)
        ls = np.array([4.0, 4.0]).reshape(-1, 1)
        diff = Sg.T[:, None, :] - Xg.T[:, :, None]
        dk = (diff / (ls[:, :, None] ** 2)) * k_star
        J_psi = (dk.transpose(1, 0, 2) @ alfa).transpose(0, 2, 1)
        dk_Kinv = dk @ K_inv
        var = 10.0 / ls**2 - np.sum(dk_Kinv * dk, axis=2)
        J_psi_var = np.repeat(var[None], 2, axis=0).transpose(2, 0, 1)
        J_gamma = np.repeat(R[None], len(X), axis=0)
        J_phi = J_gamma + J_psi @ J_gamma
        v = dX[:, :, None]
        vel = (J_phi @ v)[:, :, 0]
        vvar = (J_psi_var @ (J_gamma @ v) ** 2)[:, :, 0]
        return Xg + mean, vel, vvar

    one(0.0)  # warm numpy/BLAS
    t0 = time.perf_counter()
    for i in range(iters):
        one(0.01 * i)
    dt = time.perf_counter() - t0
    return iters / dt


def bench_ours(X, dX, S, S1, ensemble=16384, iters=5):
    import jax
    import jax.numpy as jnp
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.transport import gpt as gpt_mod

    dtype = jnp.float32
    kernel = K.Constant(10.0) * K.RBF(4.0 * jnp.ones(2, dtype)) + K.White(0.01)
    Xd, dXd, Sd = jnp.asarray(X), jnp.asarray(dX), jnp.asarray(S)
    shifts = jnp.linspace(0.0, 1.0, ensemble, dtype=dtype)
    targets = jnp.asarray(S1)[None] + shifts[:, None, None]

    f = jax.jit(
        lambda tgts: gpt_mod.fit_and_transport_batched(kernel, Sd, tgts, Xd, dXd)
    )
    t0 = time.perf_counter()
    first = f(targets)
    jax.block_until_ready(first)
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s "
        f"(backend={jax.default_backend()}, devices={jax.devices()})")
    # validity guard: a throughput number for non-finite output is garbage
    # (this caught the TPU bf16-matmul Gram corruption)
    assert bool(jnp.isfinite(first.traj).all()), "transport produced non-finite output"

    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(targets)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return ensemble * iters / dt


def bench_cholesky(n=10240, batch=1, dtype_name="float32", iters=5):
    """Large-N Gram+Cholesky+solve TFLOP/s (diagnostic)."""
    import jax
    import jax.numpy as jnp
    from gaussian_process_transportation_tpu import kernels as K
    from gaussian_process_transportation_tpu.ops.linalg import add_diagonal, cho_solve_lower

    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    Xb = jax.random.normal(key, (batch, n, 3), dtype)
    Yb = jax.random.normal(jax.random.PRNGKey(1), (batch, n, 3), dtype)
    kern = K.Constant(2.0) * K.RBF(jnp.ones(3, dtype)) + K.White(0.1)

    @jax.jit
    def run(Xs, Ys):
        def one(Xi, Yi):
            Km = add_diagonal(kern(Xi), 1e-6)
            L = jnp.linalg.cholesky(Km)
            return cho_solve_lower(L, Yi)

        return jax.vmap(one)(Xs, Ys)

    jax.block_until_ready(run(Xb, Yb))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(Xb, Yb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    # FLOPs: gram 2N²D + chol N³/3 + solves 2·2N²·P
    flops = batch * (2 * n * n * 3 + n**3 / 3 + 4 * n * n * 3) * iters
    return flops / dt / 1e12


def main():
    X, dX, S, S1 = make_workload()

    ref_rate = bench_reference_cpu(X, dX, S, S1)
    log(f"reference (sklearn/numpy, 1 CPU): {ref_rate:.1f} traj/s")

    ours_rate = bench_ours(X, dX, S, S1)
    log(f"ours (batched, 1 chip): {ours_rate:.1f} traj/s")

    try:
        tflops = bench_cholesky()
        log(f"Gram+Cholesky+solve N=10240 f32: {tflops:.2f} TFLOP/s "
            f"(scales with N: ~17 TFLOP/s at N=20480 on v5e)")
    except Exception as e:  # diagnostic only — never fail the bench line
        log(f"cholesky diagnostic skipped: {e}")

    print(
        json.dumps(
            {
                "metric": "transported_trajectories_per_s_per_chip",
                "value": round(ours_rate, 2),
                "unit": "traj/s/chip",
                "vs_baseline": round(ours_rate / ref_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
