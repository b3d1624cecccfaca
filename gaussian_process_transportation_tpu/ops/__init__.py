from .linalg import (
    add_diagonal,
    cholesky_with_jitter,
    cho_solve_lower,
    tri_solve_lower,
    log_det_from_chol,
)

from .mixed_linalg import (
    blocked_cholesky,
    ir_solve,
    pcg_solve,
    gram_chol_solve_mixed,
)

__all__ = [
    "add_diagonal",
    "cholesky_with_jitter",
    "cho_solve_lower",
    "tri_solve_lower",
    "log_det_from_chol",
    "blocked_cholesky",
    "ir_solve",
    "pcg_solve",
    "gram_chol_solve_mixed",
]
