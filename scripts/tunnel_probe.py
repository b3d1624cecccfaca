"""Tunnel health monitor: log the round-trip latency of a tiny TPU matmul
every ~3 min to /tmp/tunnel_health.log so timed work can be scheduled into
healthy windows (the axon tunnel has ≥20-min outage windows, CLAUDE.md).

Holds ONE backend connection; each probe is a fresh dispatch + host pull.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

LOG = "/tmp/tunnel_health.log"

x = jnp.ones((128, 128), jnp.float32)
f = jax.jit(lambda a: (a @ a).sum())

while True:
    t0 = time.time()
    try:
        v = float(np.asarray(f(x)))
        dt = time.time() - t0
        line = f"{time.strftime('%H:%M:%S')} ok {dt:.2f}s"
    except Exception as e:  # pragma: no cover
        dt = time.time() - t0
        line = f"{time.strftime('%H:%M:%S')} ERR {dt:.2f}s {e!r:.80}"
    with open(LOG, "a") as fh:
        fh.write(line + "\n")
    time.sleep(180)
