"""Jitted phase trainers and the operator-split time stepper."""
from .fluid import NeuralFluid, SimState  # noqa: F401
