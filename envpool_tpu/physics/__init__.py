"""TPU-native rigid-body physics engine (MJX-lite via autodiff)."""

from .dynamics import ContactParams, bias_forces, mass_matrix, step
from .model import PhysModel, from_mj_model, from_mjcf

__all__ = [
    "ContactParams",
    "PhysModel",
    "bias_forces",
    "from_mj_model",
    "from_mjcf",
    "mass_matrix",
    "step",
]
