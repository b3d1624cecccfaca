"""Component-level timing of the blocked Cholesky pipeline on TPU.

Times (a) Gram panel build, (b) panel factorization kernel alone,
(c) full cholesky_panels, (d) blocked solve — to locate overheads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from gaussian_process_transportation_tpu.ops import blocked_chol as bc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
PREC = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}[sys.argv[3] if len(sys.argv) > 3 else "high"]
ITERS = int(os.environ.get("ITERS", "10"))

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
Y = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
ls = jnp.ones(3, jnp.float32)

print(f"N={N} B={B} backend={jax.default_backend()}", flush=True)


def _sync(out):
    """Force completion with a single scalar host transfer (one element per
    output leaf, reduced on device) — never move the big buffers over the
    tunnel."""
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    s = sum(jnp.sum(l[(0,) * l.ndim]).astype(jnp.float32) for l in leaves)
    np.asarray(s)


def timed(name, fn, flops=None):
    out = fn()  # compile
    _sync(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        _sync(out)
        reps.append((time.perf_counter() - t0) / ITERS)
    dt = float(np.median(reps))
    extra = f" -> {flops/dt/1e12:.2f} TFLOP/s" if flops else ""
    print(f"{name:28s}: {dt*1e3:7.2f} ms{extra}", flush=True)
    return dt


gram_j = jax.jit(lambda Xs: bc.rbf_gram_panels(Xs, ls, 2.0, 0.1, B, PREC)[0])
timed("gram panels", lambda: gram_j(X))

panels = gram_j(X)
panels = jax.tree_util.tree_map(lambda x: jax.device_put(x), panels)

# panel kernel alone: factor the first diagonal block 20x
diag = panels[0][:B]
fp = jax.jit(lambda d: bc.factor_panel(d, interpret=False))
t = timed("factor_panel x1", lambda: fp(diag))
print(f"  -> x{N//B} panels ~= {t*(N//B)*1e3:.2f} ms", flush=True)

chol_j = jax.jit(lambda ps: bc.cholesky_panels(ps, N, PREC, interpret=False))
timed("cholesky_panels", lambda: chol_j(panels), flops=N**3 / 3)

ch = chol_j(panels)
solve_j = jax.jit(lambda c, y: c.solve(y, PREC))
timed("solve (3 rhs)", lambda: solve_j(ch, Y))

full = jax.jit(lambda Xs, Ys: bc.gram_cholesky_solve(
    Xs, Ys, ls, 2.0, 0.1, block=B, precision=PREC, interpret=False)[0])
timed("fused gram+chol+solve", lambda: full(X, Y),
      flops=2 * N * N * 3 + N**3 / 3 + 4 * N * N * 3)
