from .linalg import (
    add_diagonal,
    cholesky_with_jitter,
    cho_solve_lower,
    tri_solve_lower,
    log_det_from_chol,
)

__all__ = [
    "add_diagonal",
    "cholesky_with_jitter",
    "cho_solve_lower",
    "tri_solve_lower",
    "log_det_from_chol",
]
