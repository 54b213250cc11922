"""Analytic 3D boundary: a closed axis-aligned box (all shipped 3D scenes
use cube.obj as the WoSt boundary; obstacles enter only through the hard
boundary conditions, not the walk geometry). Convex from inside -> no
silhouettes, star radius is trivially maximal, ray intersection is the
slab test.
"""
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

FAR = 1.0e6


class Box3D(NamedTuple):
    bmin: jax.Array   # (3,)
    bmax: jax.Array   # (3,)


def make_box3d(bmin, bmax):
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float64), jnp.float32)
    return Box3D(bmin=f32(bmin), bmax=f32(bmax))


def closest_point(g: Box3D, x):
    d = jnp.minimum(jnp.abs(x - g.bmin), jnp.abs(g.bmax - x))
    dist = jnp.min(d, axis=-1)
    in_box = jnp.all((x >= g.bmin) & (x <= g.bmax), axis=-1)
    sign = jnp.where(in_box, -1.0, 1.0)
    return dist, sign * dist, None, None


def distance(g: Box3D, x):
    return closest_point(g, x)[0]


def signed_distance(g: Box3D, x):
    return closest_point(g, x)[1]


def inside(g: Box3D, x):
    return signed_distance(g, x) < 0.0


def ray_intersect(g: Box3D, o, d, t_max):
    """Nearest wall hit with t > 0 (from inside: the exit point)."""
    eps = 1e-12
    t_best = jnp.broadcast_to(jnp.inf, t_max.shape)
    n_best = jnp.zeros(o.shape, o.dtype)
    for axis in range(3):
        for w, nrm_sign in ((g.bmin[axis], -1.0), (g.bmax[axis], 1.0)):
            denom = d[..., axis]
            t = (w - o[..., axis]) / jnp.where(jnp.abs(denom) < eps, eps,
                                               denom)
            ok = (jnp.abs(denom) >= eps) & (t > 0.0)
            t = jnp.where(ok, t, jnp.inf)
            better = t < t_best
            t_best = jnp.where(better, t, t_best)
            n = jnp.zeros(o.shape, o.dtype).at[..., axis].set(nrm_sign)
            n_best = jnp.where(better[..., None], n, n_best)
    hit = jnp.isfinite(t_best) & (t_best <= t_max)
    t_hit = jnp.where(hit, t_best, t_max)
    return hit, t_hit, o + t_hit[..., None] * d, n_best


def has_line_of_sight(g: Box3D, x, y):
    d = y - x
    ln = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(ln, 1e-20)[..., None]
    hit, _, _, _ = ray_intersect(g, x, dn, ln * (1.0 - 1e-5))
    return ~hit


def star_radius(g: Box3D, x, min_radius, max_radius):
    return jnp.maximum(jnp.broadcast_to(max_radius, x.shape[:-1]),
                       min_radius)


def dist_to_far_bbox_corner(g: Box3D, x):
    far = jnp.maximum(jnp.abs(x - g.bmin), jnp.abs(x - g.bmax))
    return jnp.linalg.norm(far, axis=-1)


def outside_bbox(g: Box3D, x):
    return jnp.any((x < g.bmin) | (x > g.bmax), axis=-1)
