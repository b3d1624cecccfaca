from .exact_gp import (
    ExactGP,
    condition,
    log_marginal_likelihood,
    fit,
    fit_jit,
    predict,
    predict_cov,
    sample_y,
    jacobian,
    variance_gradient,
    white_noise_level,
)
from .gp_regressor import GaussianProcess
from .affine import AffineTransform

__all__ = [
    "ExactGP",
    "condition",
    "log_marginal_likelihood",
    "fit",
    "fit_jit",
    "predict",
    "predict_cov",
    "sample_y",
    "jacobian",
    "variance_gradient",
    "white_noise_level",
    "GaussianProcess",
    "AffineTransform",
]
