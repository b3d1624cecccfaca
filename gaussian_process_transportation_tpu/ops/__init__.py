from .linalg import (
    add_diagonal,
    cholesky_with_jitter,
    cho_solve_lower,
    tri_solve_lower,
    log_det_from_chol,
)

# Pallas-panel blocked Cholesky — the production large-N path.
from .blocked_chol import (
    BlockedCholesky,
    blocked_cholesky,
    cholesky_panels,
    factor_panel,
    gram_cholesky_solve,
    rbf_gram_panels,
    stationary_from_sqdist,
    stationary_gram_panels,
)

# Closed-form LML + hyperparameter gradients in panel form (large-N fits).
from .blocked_lml import (
    blocked_lml_value_and_grad,
    kinv_panels,
    make_blocked_lml,
    stationary_dk_dd2,
    tri_inverse_panels,
)

# Experimental XLA-level mixed-precision variants (lose to the Pallas path
# on TPU — kept for the PCG refinement and as a measured record).
from .mixed_linalg import (
    blocked_cholesky as blocked_cholesky_mixed,
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
    "BlockedCholesky",
    "blocked_cholesky",
    "cholesky_panels",
    "factor_panel",
    "gram_cholesky_solve",
    "rbf_gram_panels",
    "stationary_from_sqdist",
    "stationary_gram_panels",
    "blocked_lml_value_and_grad",
    "kinv_panels",
    "make_blocked_lml",
    "stationary_dk_dd2",
    "tri_inverse_panels",
    "blocked_cholesky_mixed",
    "ir_solve",
    "pcg_solve",
    "gram_chol_solve_mixed",
]
