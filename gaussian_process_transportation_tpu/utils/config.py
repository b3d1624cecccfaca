"""Typed configuration dataclasses.

The reference has no config system — kernels are constructed inline at
every call site (``example/2D/surface_generalization.py:49,67``,
``main_tags.py:77``) and constants live in constructor defaults.  Here a
workload is described by serializable dataclasses; ``build_kernel``
reconstructs kernel expressions from specs, and the preset functions
reproduce each reference example's exact settings.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp

from .. import kernels as K


@dataclass(frozen=True)
class KernelSpec:
    """One multiplicative group ``constant · base(lengthscale)`` or an
    additive white term; a full kernel is a sum of terms."""

    kind: str  # 'rbf' | 'matern' | 'white' | 'constant'
    value: float = 1.0  # constant value or noise level
    lengthscale: Tuple[float, ...] = (1.0,)
    nu: float = 1.5
    bounds: Tuple[float, float] = (1e-5, 1e5)


@dataclass(frozen=True)
class KernelConfig:
    terms: Tuple[Tuple[KernelSpec, ...], ...]  # sum of products

    def build(self) -> K.Kernel:
        total = None
        for product_terms in self.terms:
            prod = None
            for spec in product_terms:
                k = _build_one(spec)
                prod = k if prod is None else prod * k
            total = prod if total is None else total + prod
        return total

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "KernelConfig":
        raw = json.loads(s)
        terms = tuple(
            tuple(KernelSpec(**{**t, "lengthscale": tuple(t["lengthscale"]),
                                "bounds": tuple(t["bounds"])}) for t in group)
            for group in raw["terms"]
        )
        return KernelConfig(terms=terms)


def _build_one(spec: KernelSpec) -> K.Kernel:
    if spec.kind == "rbf":
        return K.RBF(jnp.asarray(spec.lengthscale), bounds=spec.bounds)
    if spec.kind == "matern":
        return K.Matern(jnp.asarray(spec.lengthscale), nu=spec.nu, bounds=spec.bounds)
    if spec.kind == "white":
        return K.White(spec.value, bounds=spec.bounds)
    if spec.kind == "constant":
        return K.Constant(spec.value, bounds=spec.bounds)
    raise ValueError(f"unknown kernel kind {spec.kind!r}")


@dataclass(frozen=True)
class TransportConfig:
    kernel: KernelConfig
    do_scale: bool = False
    do_rotation: bool = True
    optimize_hyperparameters: bool = True
    n_restarts: int = 5
    jitter: float = 1e-10


@dataclass(frozen=True)
class MeshConfig:
    n_ens: Optional[int] = None
    n_data: int = 1


# ---- presets reproducing the reference examples ---------------------------

def surface_2d_transport_config() -> TransportConfig:
    """``example/2D/surface_generalization.py:67``:
    C(10)·RBF([4,4]) + White(0.01)."""
    return TransportConfig(
        kernel=KernelConfig(
            terms=(
                (KernelSpec("constant", value=10.0), KernelSpec("rbf", lengthscale=(4.0, 4.0))),
                (KernelSpec("white", value=0.01),),
            )
        )
    )


def dynamics_2d_config() -> KernelConfig:
    """``example/2D/surface_generalization.py:49``:
    C(√0.1)·Matern₂.₅([1,1]) + White(0.01)."""
    return KernelConfig(
        terms=(
            (
                KernelSpec("constant", value=float(jnp.sqrt(0.1))),
                KernelSpec("matern", lengthscale=(1.0, 1.0), nu=2.5),
            ),
            (KernelSpec("white", value=0.01),),
        )
    )


def multi_frame_transport_config() -> TransportConfig:
    """``models/model_gpt.py:14``: C(√10)·RBF(20, [10,50]) + White(0.01)."""
    return TransportConfig(
        kernel=KernelConfig(
            terms=(
                (
                    KernelSpec("constant", value=float(jnp.sqrt(10.0))),
                    KernelSpec("rbf", lengthscale=(20.0,), bounds=(10.0, 50.0)),
                ),
                (KernelSpec("white", value=0.01, bounds=(1e-7, 1e-6)),),
            )
        ),
        do_scale=True,
    )
