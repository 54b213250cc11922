"""Matplotlib renderers for velocity/vorticity/density frames.

Rebuild of src/{2d,3d}/utils/vis_utils.py: quiver plots for vector fields,
pcolormesh for scalar fields, gif assembly. Headless (Agg) and optional —
simulation never depends on these.
"""
import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def draw_vector_field2d(u, v, x, y, path, figsize=(6, 6)):
    """vis_utils.py:8-33 (quiver)."""
    fig, ax = plt.subplots(figsize=figsize)
    ax.quiver(x, y, u, v)
    ax.set_aspect("equal")
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight", pad_inches=0, dpi=120)
    plt.close(fig)


def draw_scalar_field2d(arr, path, vmin=None, vmax=None, cmap="bwr",
                        figsize=(6, 6)):
    """vis_utils.py:36-61 (imshow of a scalar grid)."""
    fig, ax = plt.subplots(figsize=figsize)
    ax.imshow(np.asarray(arr).T, origin="lower", vmin=vmin, vmax=vmax,
              cmap=cmap)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight", pad_inches=0, dpi=120)
    plt.close(fig)


def draw_scatter(pts, vals, path, cmap="viridis", figsize=(6, 6)):
    """model_split.py:291-297 (pressure cloud scatter)."""
    fig, ax = plt.subplots(figsize=figsize)
    sc = ax.scatter(pts[:, 0], pts[:, 1], c=vals, cmap=cmap, s=0.1)
    ax.set_axis_off()
    plt.colorbar(sc)
    fig.savefig(path, bbox_inches="tight", pad_inches=0, dpi=120)
    plt.close(fig)


def frames_to_gif(frame_dir, pattern, out_path, fps=10):
    """vis_utils.py:103-106."""
    try:
        import imageio.v2 as imageio
    except ImportError:
        return None
    files = sorted(f for f in os.listdir(frame_dir) if pattern in f
                   and f.endswith(".png"))
    if not files:
        return None
    imgs = [imageio.imread(os.path.join(frame_dir, f)) for f in files]
    imageio.mimsave(out_path, imgs, fps=fps)
    return out_path


def save_txt_grid(path, arr):
    """main.py:178-188 txt dumps: flatten leading grid dims."""
    a = np.asarray(arr)
    np.savetxt(path, a.reshape(-1, a.shape[-1]) if a.ndim > 2
               else a.reshape(-1, 1))
