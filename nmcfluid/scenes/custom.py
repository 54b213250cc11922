"""User scenes from 2D line OBJs / 3D triangle OBJs.

Mirrors what src/2d/main.py:36-59 does with the --wost_json boundary file:
measure the bbox, split boundary segments into outer walls vs interior
obstacle loops (a segment is an obstacle if either endpoint is strictly
inside the bbox), and derive an obstacle SDF. The reference fits a circle
to the obstacle vertices (main.py:95-103); here the exact polygon SDF is
used (winding-number sign x distance to segments — same contract:
positive in the fluid).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from ..geometry.obj_io import read_obj_2d, read_obj_3d
from ..geometry.soup2d import build_segments
from ..geometry.soup3d import build_triangles
from .specs import SceneSpec, SCENES


def polygon_sdf(verts, segs):
    """sdf(x) > 0 outside the polygon soup (fluid side), < 0 inside, via
    crossing-number sign x unsigned segment distance (replaces the
    gpytoolbox winding-number SDF of src/2d/sources.py:102-119)."""
    a = jnp.asarray(verts[segs[:, 0]], jnp.float32)
    b = jnp.asarray(verts[segs[:, 1]], jnp.float32)

    def f(x):
        ab = b - a
        xa = x[..., None, :] - a
        t = jnp.clip(jnp.sum(xa * ab, -1)
                     / jnp.maximum(jnp.sum(ab * ab, -1), 1e-20), 0.0, 1.0)
        d = jnp.linalg.norm(xa - t[..., None] * ab, axis=-1)
        dist = jnp.min(d, axis=-1)
        # crossing number along +x
        ya, yb = a[:, 1], b[:, 1]
        cond = ((ya <= x[..., None, 1]) & (yb > x[..., None, 1])) | \
               ((yb <= x[..., None, 1]) & (ya > x[..., None, 1]))
        xs = a[:, 0] + (x[..., None, 1] - ya) / jnp.where(
            jnp.abs(yb - ya) < 1e-20, 1.0, yb - ya) * (b[:, 0] - a[:, 0])
        crossings = jnp.sum(cond & (xs > x[..., None, 0]), axis=-1)
        inside = (crossings % 2) == 1
        return jnp.where(inside, -dist, dist)
    return f


def scene_from_obj(name, obj_path, dim=2, source_builder=None,
                   base="karman", **overrides):
    """Build a SceneSpec whose boundary comes from an OBJ file.

    `base` picks hyperparameter defaults from the catalog; `source_builder`
    (spec, x, key) -> velocity defaults to zero inflow."""
    tmpl = SCENES[base]
    if dim == 2:
        verts, segs = read_obj_2d(obj_path)
        mn, mx = verts.min(0), verts.max(0)
        scene_size = (float(mn[0]), float(mx[0]), float(mn[1]), float(mx[1]))
        strict_in = ((verts > mn + 1e-12) & (verts < mx - 1e-12)).all(1)
        obs_mask = strict_in[segs[:, 0]] | strict_in[segs[:, 1]]
        obs_segs = segs[obs_mask]
        soup = build_segments([(verts, segs)])
        sdf_builder = None
        if len(obs_segs):
            sdf = polygon_sdf(verts, obs_segs)
            sdf_builder = lambda spec: sdf
    else:
        verts, faces = read_obj_3d(obj_path)
        mn, mx = verts.min(0), verts.max(0)
        scene_size = tuple(float(v) for pair in zip(mn, mx) for v in pair)
        soup = build_triangles(verts, faces)
        sdf_builder = None

    src = source_builder or (lambda spec, x, key:
                             jnp.zeros(x.shape[:-1] + (dim,), jnp.float32))
    return dataclasses.replace(
        tmpl, name=name, dim=dim, scene_size=scene_size,
        _boundary_builder=lambda spec: soup,
        _obstacle_sdf_builder=sdf_builder,
        _source_builder=src, **overrides)
