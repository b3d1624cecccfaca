"""Vector fields, rollouts, and plotting helpers.

Compute parts (grid fields, Euler rollouts) are pure jitted functions —
the reference's per-cell Python loops (``plot_utils.py:181-207``, the 10⁴
GP predicts per figure) become one batched predict + one ``lax.scan``.
Matplotlib is imported lazily so headless/TPU environments never pay for
it; every ``plot_*``/``draw_*`` helper degrades to a no-op if matplotlib
is unavailable.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import exact_gp as core

Array = jax.Array


# ---------------------------------------------------------------------------
# Compute
# ---------------------------------------------------------------------------

def vector_field(
    gp: core.ExactGP, x_grid: Array, y_grid: Array
) -> Tuple[Array, Array, Array]:
    """(u, v, std) on the meshgrid — the reference's ``create_vectorfield``
    as one batched predict."""
    gx, gy = jnp.meshgrid(jnp.asarray(x_grid), jnp.asarray(y_grid))
    pos = jnp.column_stack([gx.ravel(), gy.ravel()])
    mean, std = core.predict(gp, pos, return_std=True)
    shape = gx.shape
    return (
        mean[:, 0].reshape(shape),
        mean[:, 1].reshape(shape),
        std.reshape(shape + (std.shape[1],)),
    )


def rollout_gp_ds(
    gp: core.ExactGP,
    x0: Array,
    n_steps: int,
    dt: float = 1.0,
    modulation_fn: Optional[Callable[[Array], Array]] = None,
) -> Array:
    """Euler rollout of the GP dynamical system ẋ = f(x) (optionally
    modulated: ẋ = M(x) f(x)); x0: (B, D) → (n_steps, B, D)."""

    def step(x, _):
        v = core.predict(gp, x)
        if modulation_fn is not None:
            v = (modulation_fn(x) @ v[:, :, None])[:, :, 0]
        x_new = x + v * dt
        return x_new, x_new

    _, traj = jax.lax.scan(step, jnp.asarray(x0), None, length=n_steps)
    return traj


def min_variance_attractor_field(
    gp: core.ExactGP, query: Array, step: float = 1.0
) -> Array:
    """Velocity field that descends the predictive variance — the
    uncertainty-seeking attractor field of ``plot_utils.py:283-297``:
    v(x) = −∂σ²/∂x, normalized."""
    g = core.variance_gradient(gp, jnp.asarray(query))
    n = jnp.linalg.norm(g, axis=1, keepdims=True)
    return -step * g / jnp.maximum(n, 1e-12)


# ---------------------------------------------------------------------------
# Plotting (lazy matplotlib)
# ---------------------------------------------------------------------------

def _plt():
    try:
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def plot_vector_field(gp, x_grid, y_grid, demo=None, surface=None, ax=None, density=2):
    plt = _plt()
    if plt is None:
        return None
    u, v, _ = vector_field(gp, x_grid, y_grid)
    gx, gy = np.meshgrid(np.asarray(x_grid), np.asarray(y_grid))
    ax = ax or plt.figure(figsize=(12, 7)).gca()
    ax.streamplot(gx, gy, np.asarray(u), np.asarray(v), density=density)
    if demo is not None:
        ax.scatter(np.asarray(demo)[:, 0], np.asarray(demo)[:, 1], color=[1, 0, 0])
    if surface is not None:
        ax.scatter(np.asarray(surface)[:, 0], np.asarray(surface)[:, 1], color=[0, 0, 0])
    return ax


def draw_error_band(ax, x, y, err, loop: bool = False, **kwargs):
    """Normal-offset error band around a curve (``plot_utils.py:326-352``)."""
    plt = _plt()
    if plt is None or ax is None:
        return None
    from matplotlib.patches import PathPatch
    from matplotlib.path import Path

    x, y = np.asarray(x), np.asarray(y)
    err = np.asarray(err)
    if err.ndim == 2:
        err = np.linalg.norm(err, axis=1)
    dx = np.gradient(x)
    dy = np.gradient(y)
    l = np.hypot(dx, dy)
    l = np.where(l > 1e-12, l, 1.0)
    nx, ny = dy / l, -dx / l
    xp, yp = x + nx * err, y + ny * err
    xn, yn = x - nx * err, y - ny * err
    vertices = np.block([[xp, xn[::-1]], [yp, yn[::-1]]]).T
    codes = np.full(len(vertices), Path.LINETO)
    codes[0] = codes[len(xp)] = Path.MOVETO
    path = Path(vertices, codes)
    ax.add_patch(PathPatch(path, **kwargs))
    return ax
