"""Passive density transport, error metrics, and volume export."""
from .density import (advect_density, init_density, taylor_green_truth,
                      tg_velocity_error, transport_rollout)  # noqa: F401
