"""VERDICT r4 #4: can conditioning control (equilibration / scaling) unlock
the HIGH (bf16x3) roofline for the blocked Cholesky on GP-realistic
workloads?

Hypotheses tested, on the κ≈1e5 workload of scripts/bench_ensemble_3d.py
(N=2500 surface Gram, C·RBF+White(0.01)) and the N=10240 bench workload:

1. Jacobi (diagonal) equilibration:  K' = D^-1/2 K D^-1/2 with D=diag(K).
   A stationary GP Gram has CONSTANT diagonal (amp + noise), so D = cI and
   the scaling is exactly a no-op on κ — measured here to pin it.
2. Ruiz (iterative row/col inf-norm) equilibration: stationary kernels
   give near-equal row norms (every row's max is its diagonal), so Ruiz
   also converges to ~cI — measured.
3. Conclusion check: the κ of a GP Gram lives in the eigenvalue decay of
   the smooth kernel (near-collinear rows), which NO diagonal scaling
   touches.  The bf16x3-refinement divergence at κ≳1e5 (r4 finding,
   recorded at ops/mixed_linalg.py and exact_gp.condition_blocked) is
   therefore not fixable by equilibration; the measured fallback that DOES
   converge at any κ reachable in f32 is PCG with the HIGH factor as
   preconditioner (ops/mixed_linalg.py) or HIGHEST+1-refine (default).

Run parts: --kappa (CPU f64 spectrum study), --accuracy (TPU, HIGH vs
HIGHEST factor accuracy with/without scaling).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def surface_workload(N=2500, noise=0.01, seed=0):
    """The GP-realistic surface Gram of scripts/bench_ensemble_3d.py."""
    rng = np.random.default_rng(seed)
    g = int(np.sqrt(N))
    N = g * g
    xs = np.linspace(-2, 2, g)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.3 * np.sin(2 * gx) * np.cos(1.5 * gy) + 0.05 * rng.standard_normal(gx.shape)
    X = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1)
    ls = np.array([1.0, 1.0, 0.5])
    amp = 1.0
    Z = X / ls
    d2 = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    K = amp * np.exp(-0.5 * d2) + noise * np.eye(N)
    return K.astype(np.float64), X, ls, amp, noise


def ruiz_equilibrate(K, iters=10):
    """Symmetric Ruiz scaling: d <- d / sqrt(row_inf_norm) iterated."""
    d = np.ones(K.shape[0])
    Ks = K.copy()
    for _ in range(iters):
        r = np.sqrt(np.abs(Ks).max(axis=1))
        r[r == 0] = 1.0
        Ks = Ks / r[:, None] / r[None, :]
        d = d * r
    return Ks, d


def kappa_study():
    K, X, ls, amp, noise = surface_workload()
    N = K.shape[0]
    ev = np.linalg.eigvalsh(K)
    kap = ev[-1] / ev[0]
    print(f"N={N} raw kappa = {kap:.3e} (diag const: "
          f"{K.diagonal().min():.6f}..{K.diagonal().max():.6f})")

    # Jacobi
    d = np.sqrt(K.diagonal())
    Kj = K / d[:, None] / d[None, :]
    evj = np.linalg.eigvalsh(Kj)
    print(f"Jacobi kappa = {evj[-1]/evj[0]:.3e} "
          f"(change {abs(evj[-1]/evj[0]-kap)/kap*100:.2f}%)")

    # Ruiz
    Kr, dr = ruiz_equilibrate(K)
    evr = np.linalg.eigvalsh(Kr)
    print(f"Ruiz   kappa = {evr[-1]/evr[0]:.3e} "
          f"(change {abs(evr[-1]/evr[0]-kap)/kap*100:.2f}%; "
          f"scale spread {dr.max()/dr.min():.4f})")


def accuracy_study():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from gaussian_process_transportation_tpu.ops.blocked_chol import (
        gram_cholesky_solve,
    )

    K, X, ls, amp, noise = surface_workload()
    N = K.shape[0]
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((N, 2))
    a64 = np.linalg.solve(K, Y)

    for prec_name, prec, refines in (
        ("HIGHEST", jax.lax.Precision.HIGHEST, (0, 1)),
        ("HIGH", jax.lax.Precision.HIGH, (0, 1, 3)),
    ):
        for r in refines:
            alpha, _ = jax.jit(
                lambda Xs, Ys, p=prec, ri=r: gram_cholesky_solve(
                    Xs, Ys, jnp.asarray(ls, jnp.float32), amp, noise,
                    block=512, precision=p, refine_iters=ri,
                )
            )(jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32))
            err = np.abs(np.asarray(alpha) - a64).max() / np.abs(a64).max()
            print(f"{prec_name} refine={r}: alpha rel err {err:.3e}",
                  flush=True)


if __name__ == "__main__":
    if "--accuracy" in sys.argv:
        accuracy_study()
    else:
        kappa_study()
