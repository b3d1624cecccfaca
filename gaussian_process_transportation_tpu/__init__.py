"""TPU-native Gaussian Process Transportation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``gaussian_process_transportation`` (TU Delft, arXiv:2404.13458): policy
transportation via affine + GP-residual maps with uncertainty-aware
position / velocity / orientation push-forward, sparse variational GPs,
alternative delta-map models, obstacle-avoidance modulation, and pod-scale
ensembles/samplers sharded over a TPU mesh.
"""

from . import kernels
from .models import (
    GaussianProcess,
    AffineTransform,
)
from .transport.gpt import GaussianProcessTransportation
from .utils.resample import resample

__all__ = [
    "kernels",
    "GaussianProcess",
    "AffineTransform",
    "GaussianProcessTransportation",
    "resample",
]

__version__ = "0.1.0"
