"""Per-timestep checkpoints of the velocity network.

Mirrors the reference's design where the *only* persistent simulation
state is network weights + the timestep (base.py:102-127): one file per
step, `ckpt_step_t{NNN}.npz`, resumable, and the input to the
density/eval replay passes. Plain npz of the flattened parameter pytree —
no framework lock-in, loadable from numpy alone.
"""
import os
import re

import jax
import numpy as np


def _path(model_dir, step_or_name):
    if isinstance(step_or_name, int):
        return os.path.join(model_dir, f"ckpt_step_t{step_or_name:03d}.npz")
    return os.path.join(model_dir, f"ckpt_{step_or_name}.npz")


def save_ckpt(model_dir, params, timestep, name=None):
    """base.py:102-115. Saves leaves in pytree order + the timestep."""
    os.makedirs(model_dir, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(params)
    path = _path(model_dir, name if name is not None else int(timestep))
    np.savez(path, timestep=int(timestep),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return path


def load_ckpt(model_dir, params_like, step_or_name):
    """base.py:117-127. Returns (params, timestep); `params_like` supplies
    the pytree structure."""
    with np.load(_path(model_dir, step_or_name)) as z:
        leaves = [z[f"leaf_{i}"]
                  for i in range(len(jax.tree_util.tree_leaves(params_like)))]
        t = int(z["timestep"])
    treedef = jax.tree_util.tree_structure(params_like)
    return jax.tree_util.tree_unflatten(treedef, leaves), t


def latest_step(model_dir):
    """Highest saved step number, or -1."""
    best = -1
    if not os.path.isdir(model_dir):
        return best
    for f in os.listdir(model_dir):
        m = re.match(r"ckpt_step_t(\d+)\.npz$", f)
        if m:
            best = max(best, int(m.group(1)))
    return best
