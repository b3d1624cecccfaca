"""Time the panel Gram build alone, per stationary family, on the real chip.

Diagnoses the Matern fast-path deficit (VERDICT r2 #3: Matern gram+chol+solve
should land within ~10% of RBF; measured 18.0 vs 25.1 TFLOP/s at N=10240 with
the gap attributed to the Gram build).  This isolates the Gram stage: build
all panels, reduce each to a scalar on device, sync once via a tiny transfer
(CLAUDE.md: block_until_ready does not synchronize over the axon tunnel).

Usage: python scripts/bench_gram_families.py [N] [block]
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
ITERS = int(os.environ.get("ITERS", "10"))

jax.config.update("jax_default_matmul_precision", "highest")

from gaussian_process_transportation_tpu.ops.blocked_chol import (
    stationary_gram_panels,
    STATIONARY_FAMILIES,
)

print(f"N={N} block={BLOCK} backend={jax.default_backend()}", flush=True)

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
ls = jnp.ones((3,), jnp.float32)

for family in STATIONARY_FAMILIES:

    @jax.jit
    def build(X, ls, family=family):
        panels, _ = stationary_gram_panels(X, ls, 2.0, 0.1, BLOCK, family=family)
        # Scalar reduce keeps every panel's computation live but avoids a
        # big host transfer when syncing.
        return sum(p.sum() for p in panels)

    t0 = time.perf_counter()
    out = build(X, ls)
    _ = np.asarray(out)
    t_first = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = build(X, ls)
        _ = np.asarray(out)
        times.append((time.perf_counter() - t0) / ITERS)
    best_ms = float(np.median(times)) * 1e3  # median, matching bench_blocked_chol
    # exact padded panel element count: sum of (Np - k*B)*B over panels
    Np = -(-N // BLOCK) * BLOCK
    nel = sum((Np - k * BLOCK) * BLOCK for k in range(Np // BLOCK))
    print(
        f"{family:9s}: first={t_first:6.1f}s  per-build={best_ms:7.3f} ms "
        f"({nel / (best_ms / 1e3) / 1e9:6.1f} Gelem/s)",
        flush=True,
    )
