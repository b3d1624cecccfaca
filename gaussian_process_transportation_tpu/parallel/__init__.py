from .mesh import make_mesh, ensemble_sharding, replicated
from .ensemble import (
    transport_ensemble,
    posterior_transport_ensemble,
    make_ensemble_train_step,
)

__all__ = [
    "make_mesh",
    "ensemble_sharding",
    "replicated",
    "transport_ensemble",
    "posterior_transport_ensemble",
    "make_ensemble_train_step",
]
