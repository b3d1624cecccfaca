"""Stateful convenience wrapper over the functional exact-GP core.

Mirrors the duck-typed model interface of the reference
(``policy_transportation/models/gaussian_process.py:16-126``):
``fit(X, Y)``, ``predict(x, return_std)``, ``samples(x)``,
``derivative(x, return_var)``, ``derivative_of_variance(x)`` — so transport
orchestration code can swap models freely.  All compute dispatches to the
jitted functional API in :mod:`.exact_gp`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import Kernel
from . import exact_gp as core


class GaussianProcess:
    def __init__(
        self,
        kernel: Kernel,
        alpha: float = 1e-10,
        optimizer: Optional[str] = "lbfgs",
        n_restarts_optimizer: int = 5,
        seed: int = 0,
        jit_fit: bool = False,
    ):
        self.kernel = kernel
        self.alpha = alpha
        self.optimizer = optimizer
        self.n_restarts_optimizer = n_restarts_optimizer
        self.seed = seed
        self.jit_fit = jit_fit
        self.state: Optional[core.ExactGP] = None

    # -- reference interface -------------------------------------------------
    def fit(self, X, Y):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y if np.ndim(Y) == 2 else np.asarray(Y)[:, None])
        key = jax.random.PRNGKey(self.seed)
        if self.optimizer is None:
            Xn, Yn = core._filter_nan_rows(np.asarray(X), np.asarray(Y))
            self.state = core.condition(self.kernel, jnp.asarray(Xn), jnp.asarray(Yn), self.alpha)
        elif self.jit_fit:
            self.state = core.fit_jit(
                self.kernel, X, Y, n_restarts=self.n_restarts_optimizer, key=key, jitter=self.alpha
            )
        else:
            self.state = core.fit(
                self.kernel, X, Y, n_restarts=self.n_restarts_optimizer, key=key, jitter=self.alpha
            )
        self.kernel_ = self.state.kernel
        self.noise_var_ = self.alpha + float(core.white_noise_level(self.kernel_))
        return self

    @property
    def X(self):
        return self.state.X

    @property
    def Y(self):
        return self.state.Y

    def predict(self, x, return_std: bool = False, return_cov: bool = False):
        x = jnp.asarray(x)
        if return_cov:
            return core.predict_cov(self.state, x)
        if return_std:
            # Epistemic-only convention of the reference (line 49).
            return core.predict(self.state, x, return_std=True, epistemic_only=True)
        return core.predict(self.state, x)

    def samples(self, x, n_samples: int = 10, key=None):
        key = jax.random.PRNGKey(self.seed + 1) if key is None else key
        return core.sample_y(self.state, jnp.asarray(x), key, n_samples)

    def derivative(self, x, return_var: bool = False):
        return core.jacobian(self.state, jnp.asarray(x), return_var=return_var)

    def derivative_of_variance(self, x):
        return core.variance_gradient(self.state, jnp.asarray(x))
