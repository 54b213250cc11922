"""Declarative scene catalog (replaces examples/*/wost.json + run.sh flags,
src/{2d,3d}/sources.py and the OBJ boundary assets, generated procedurally).
"""
from .specs import SceneSpec, get_scene, SCENES  # noqa: F401
