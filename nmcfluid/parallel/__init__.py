"""Device-mesh utilities for sharding the Monte Carlo projection."""
from .mesh import points_mesh, shard_points, replicate  # noqa: F401
