from .core import PolicyTransport
from .gpt import GaussianProcessTransportation

__all__ = ["PolicyTransport", "GaussianProcessTransportation"]
