"""Checkpointing, visualization, and small file helpers."""
from .checkpoint import save_ckpt, load_ckpt, latest_step  # noqa: F401
