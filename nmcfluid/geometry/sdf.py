"""Analytic signed-distance functions for scene obstacles and masks.

Replaces the obstacle SDF factories in src/2d/sources.py:80-119 and
src/3d/sources.py:134-145 (circle, jpipe composite, sphere, cylinder) plus
the gpytoolbox winding-number mesh SDF — every shipped obstacle is one of
these analytic shapes, so the mesh fallback routes through the segment /
triangle soups instead.

Convention follows the reference: sdf > 0 in the fluid, < 0 inside the
obstacle.
"""
import jax.numpy as jnp


def circle(center, radius):
    cx, cy = float(center[0]), float(center[1])
    r = float(radius)

    def f(x):
        return jnp.sqrt((x[..., 0] - cx) ** 2 + (x[..., 1] - cy) ** 2) - r
    return f


def sphere(center, radius):
    # host floats, NOT a jnp constant: these factories are built lazily
    # from SceneSpec.obstacle_sdf (a cached_property), possibly under a
    # jit trace — a jnp array created there leaks into later traces
    c = tuple(float(v) for v in center)
    r = float(radius)

    def f(x):
        d2 = sum((x[..., i] - c[i]) ** 2 for i in range(len(c)))
        return jnp.sqrt(d2) - r
    return f


def cylinder_xz(center_xz, radius):
    """Infinite cylinder along y: distance in the (x, z) plane
    (src/3d/sources.py:141-145)."""
    cx, cz = float(center_xz[0]), float(center_xz[1])
    r = float(radius)

    def f(x):
        return jnp.sqrt((x[..., 0] - cx) ** 2 + (x[..., 2] - cz) ** 2) - r
    return f


def jpipe_walls():
    """Unsigned distance to the J-pipe walls (src/2d/sources.py:87-100):
    horizontal run [0,1]x[0,0.5], vertical run [1.5,2]x[1,2], quarter-annulus
    elbow around (1,1) with radii 0.5/1.0."""
    def f(x):
        px, py = x[..., 0], x[..., 1]
        m1 = (px >= 0.0) & (px <= 1.0)
        m2 = (py >= 1.0) & (py <= 2.0)
        d1 = jnp.minimum(jnp.abs(py - 0.5), jnp.abs(py))
        d2 = jnp.minimum(jnp.abs(px - 1.5), jnp.abs(px - 2.0))
        rr = jnp.sqrt((px - 1.0) ** 2 + (py - 1.0) ** 2)
        d3 = jnp.minimum(jnp.abs(rr - 0.5), jnp.abs(rr - 1.0))
        return jnp.where(m1, d1, jnp.where(m2, d2, d3))
    return f


def jpipe_interior_mask():
    """Boolean mask of the J-pipe interior (base.py:218-222)."""
    def f(x):
        px, py = x[..., 0], x[..., 1]
        d = jnp.sqrt((px - 1.0) ** 2 + (py - 1.0) ** 2)
        m1 = (px >= 0.0) & (px <= 1.0) & (py >= 0.0) & (py <= 0.5)
        m2 = (px >= 1.5) & (px <= 2.0) & (py >= 1.0) & (py <= 2.0)
        m3 = (d >= 0.5) & (d <= 1.0) & (px >= 1.0) & (py <= 1.0)
        return m1 | m2 | m3
    return f
