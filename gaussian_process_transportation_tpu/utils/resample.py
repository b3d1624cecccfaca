"""Arc-length uniform resampling of polylines.

Parity with ``policy_transportation/utils.py:7-45`` — the reference walks
the polyline sequentially placing points every ``total_length/(num-1)``.
That walk is equivalent to linear interpolation at arc lengths
``k * spacing``, which is what we compute here as a fully vectorized
(jit/vmap-able) gather instead of a Python loop.

Note: the reference's ``distance`` helper measures length in the first two
coordinates only (``utils.py:4-5``); pass ``planar_metric=True`` to
reproduce that behavior for ≥3-D curves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def resample(surface: Array, num_points: int = 20, planar_metric: bool = False) -> Array:
    surface = jnp.asarray(surface)
    metric_part = surface[:, :2] if planar_metric else surface
    seg = jnp.linalg.norm(jnp.diff(metric_part, axis=0), axis=1)
    cum = jnp.concatenate([jnp.zeros((1,), surface.dtype), jnp.cumsum(seg)])
    total = cum[-1]
    targets = jnp.linspace(0.0, 1.0, num_points) * total
    # interp per output dimension over the cumulative arc length
    cols = jax.vmap(lambda col: jnp.interp(targets, cum, col), in_axes=1, out_axes=1)(
        surface
    )
    return cols
