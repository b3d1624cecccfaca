"""Hardware bench for the panel-form LML value+gradient (ops/blocked_lml.py).

Usage:  timeout 900 python scripts/bench_blocked_lml.py [N] [family]

Measures on the real chip:
  * one jitted LML value+grad step at N (default 10240, D=3) — the
    per-iteration cost of large-N hyperparameter optimization;
  * effective TFLOP/s against the 3·N³/3 GEMM-FLOP model
    (factor + L⁻¹ + K⁻¹), plus the Gram/solve/trace O(N²) terms;
  * a CPU-side sklearn-equivalent timing at the same N for context (the
    reference's fit path: dense Cholesky + one O(N³) trace per θ —
    sklearn _gpr.py eval_gradient; reference gaussian_process.py:17-29).

Writes nothing; prints one summary line per stage to stdout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    family = sys.argv[2] if len(sys.argv) > 2 else "rbf"
    D = 3

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from gaussian_process_transportation_tpu.ops.blocked_lml import (
        blocked_lml_value_and_grad,
    )

    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, D)).astype(np.float32)
    Y = (np.sin(2.0 * X[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(
        np.float32
    )
    theta = {
        "log_amp": jnp.asarray(np.log(2.0), jnp.float32),
        "log_ls": jnp.zeros((D,), jnp.float32),
        "log_noise": jnp.asarray(np.log(0.1), jnp.float32),
    }

    fn = jax.jit(
        lambda Xs, Ys, t: blocked_lml_value_and_grad(
            Xs, Ys, family, t["log_amp"], t["log_ls"], t["log_noise"],
            jitter=1e-6, block=512,
            precision=jax.lax.Precision.HIGH, interpret=False,
        )
    )
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    t0 = time.perf_counter()
    val, grads = fn(Xd, Yd, theta)
    v0 = float(np.asarray(val))  # host transfer = true sync over the tunnel
    print(f"compile+first: {time.perf_counter()-t0:.1f}s  lml={v0:.1f} "
          f"grad_amp={float(np.asarray(grads[0])):.2f}")
    assert np.isfinite(v0)

    iters = 10
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(Xd, Yd, theta)
        np.asarray(out[0])
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    # FLOP model: gram O(N²D) + chol N³/3 + tri-inverse N³/3 + K⁻¹ N³/3
    # + solves/refine O(N²) + traces O(N²(D+2))
    flops = 3 * n**3 / 3 + 2 * n * n * D + 8 * n * n
    print(
        f"lml value+grad N={n} {family}: {dt*1e3:.1f} ms/step = "
        f"{flops/dt/1e12:.1f} TFLOP/s  (times ms: {[f'{t*1e3:.0f}' for t in times]})"
    )

    # CPU context: the reference's per-iteration cost at the same N
    # (dense f64 Cholesky + K⁻¹ + one einsum per hyperparameter), numpy.
    if n <= 10240:
        t0 = time.perf_counter()
        X64 = X.astype(np.float64)
        d2 = np.zeros((n, n))
        for d in range(D):
            diff = X64[:, d, None] - X64[None, :, d]
            d2 += diff * diff
        K64 = 2.0 * np.exp(-0.5 * d2) + 0.1 * np.eye(n)
        L = np.linalg.cholesky(K64)
        t_chol = time.perf_counter() - t0
        from scipy.linalg import cho_solve

        Kinv = cho_solve((L, True), np.eye(n))
        # one trace per theta component (amp + D lengthscales + noise)
        for _ in range(D + 2):
            np.sum(Kinv * K64)
        t_total = time.perf_counter() - t0
        print(
            f"reference-equivalent CPU step at N={n}: {t_total:.1f}s "
            f"(chol {t_chol:.1f}s) -> speedup {t_total/dt:.0f}x"
        )


if __name__ == "__main__":
    main()
