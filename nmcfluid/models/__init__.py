"""Coordinate-network velocity fields and per-scene hard boundary policies."""
from .siren import SirenConfig, init_siren, apply_siren  # noqa: F401
from .boundary import apply_boundary  # noqa: F401
