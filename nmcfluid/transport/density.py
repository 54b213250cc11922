"""Post-hoc passive scalar advection and the Taylor-Green error metric.

Rebuild of src/2d/move_density.py and src/3d/move_density.py: load each
timestep's checkpoint, evaluate the *raw* network velocity on a dense grid
(the reference calls `velocity_field(...)` directly, without boundary
conditions — move_density.py 2d:120, 3d:211), backtrace semi-Lagrangianly
and pull the density with linear interpolation. Unlike the reference, the
gather stays on-device (`jax.scipy.ndimage.map_coordinates` instead of a
GPU->CPU round trip into scipy each frame).

Grid convention (2d:97-101, 3d:186-190): N cells per axis, vertex-at-lo
coordinates lo + i/N*(hi-lo) (NOT cell-centered), backtraced index =
(x - lo) * N / (hi - lo); 2D uses zero fill outside, 3D clamps ('nearest').

The Taylor-Green velocity error (2d:105-106,143-146) is the paper's
headline metric: mean over a 1000^2 grid of |u_net - u_TG|^2, where u_TG
uses angles i/N*2pi (the reference compares against that grid even though
the scene box is [0.000447, 6.279553] — reproduced faithfully).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.siren import apply_siren


def _index_grid(scene_size, n, dim):
    axes = [jnp.arange(n, dtype=jnp.float32) / n
            * (scene_size[1] - scene_size[0]) + scene_size[0]
            for _ in range(dim)]
    return jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)


def init_density(scene, n):
    """Initial density field = |initial velocity| on the transport grid
    (move_density.py 2d:44-58, 3d:49-117). For vortex_collide also returns
    the red/blue ring color grid (3d:112-116)."""
    dim = scene.dim
    pts = _index_grid(scene.scene_size, n, dim)
    vel = scene.source_velocity(pts, key=jax.random.PRNGKey(0))
    d = jnp.linalg.norm(vel, axis=-1)
    if scene.name == "vortex_collide":
        c1 = jnp.asarray([0.0, 0.0, -0.21])
        c2 = jnp.asarray([0.0, 0.0, 0.21])
        m1 = jnp.linalg.norm(pts - c1, axis=-1) < 0.2
        m2 = jnp.linalg.norm(pts - c2, axis=-1) < 0.2
        col = jnp.stack([m1.astype(jnp.float32),
                         jnp.zeros_like(d),
                         m2.astype(jnp.float32)], axis=-1)
        return d, col
    return d


@partial(jax.jit, static_argnums=(4,))
def advect_density(d_grid, vel_grid, scene_size, dt, mode="constant"):
    """One semi-Lagrangian pull: rho <- rho(x - u dt), linear interp
    (move_density.py 2d:122-128, 3d:212-219)."""
    dim = d_grid.ndim
    n = d_grid.shape[0]
    pts = _index_grid(scene_size, n, dim)
    back = pts - dt * vel_grid
    idx = (back - scene_size[0]) * n / (scene_size[1] - scene_size[0])
    coords = [idx[..., i] for i in range(dim)]
    return jax.scipy.ndimage.map_coordinates(d_grid, coords, order=1,
                                             mode=mode, cval=0.0)


def raw_velocity_grid(fluid, params, n):
    """Raw network velocity (no BCs) on the transport grid (2d:120)."""
    pts = _index_grid(fluid.scene.scene_size, n, fluid.scene.dim)
    return apply_siren(params, fluid.siren_cfg, pts)


def taylor_green_truth(n):
    """The analytic steady TG field on the i/N*2pi grid (2d:105-106)."""
    ang = np.arange(n) / n * 2.0 * np.pi
    ax, ay = np.meshgrid(ang, ang, indexing="ij")
    return np.stack([np.sin(ax) * np.cos(ay),
                     -np.cos(ax) * np.sin(ay)], axis=-1)


def tg_velocity_error(vel_grid, truth=None):
    """mean |u - u_TG|^2 over the grid (2d:143-146) — the BASELINE.md
    metric (published mean 4.142e-4 over 50 frames)."""
    n = vel_grid.shape[0]
    if truth is None:
        truth = taylor_green_truth(n)
    diff = np.asarray(vel_grid) - truth
    return float(np.mean(np.sum(diff ** 2, axis=-1)))


def transport_rollout(fluid, params_per_step, n=None, dt=None,
                      with_error=None):
    """Replay checkpoints: advect density and (for taylorgreen) collect the
    per-frame velocity error (move_density.py 2d:116-152). Yields
    (t, d_grid, vel_grid, err)."""
    scene = fluid.scene
    n = n or (1000 if scene.dim == 2 else 200)
    dt = dt or scene.dt
    with_error = (scene.name == "taylorgreen") if with_error is None \
        else with_error
    mode = "constant" if scene.dim == 2 else "nearest"
    init = init_density(scene, n)
    d_grid = init[0] if isinstance(init, tuple) else init
    truth = taylor_green_truth(n) if with_error else None
    ss = scene.scene_size
    for t, params in enumerate(params_per_step):
        vel = raw_velocity_grid(fluid, params, n)
        # 3D skips the pull at t=0 (3d:212); 2D pulls every frame (2d:122)
        if scene.dim == 2 or t > 0:
            d_grid = advect_density(d_grid, vel, ss, dt, mode)
        err = tg_velocity_error(vel, truth) if with_error else None
        yield t, d_grid, vel, err
