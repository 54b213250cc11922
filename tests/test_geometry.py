import numpy as np
import jax.numpy as jnp
import pytest

from nmcfluid.geometry import (build_segments, build_triangles, box_tris,
                               queries2d, queries3d)
from nmcfluid.geometry.soup2d import box_loop, circle_loop_cw


@pytest.fixture(scope="module")
def karman_like():
    # rectangle walls (open left/right) + clockwise circle obstacle,
    # mirroring examples/karman/geometry_1cyl_long_open.obj topology
    bot = (np.array([[-1.0, -0.6], [0.0, -0.6], [1.9, -0.6]]),
           np.array([[0, 1], [1, 2]]))
    top = (np.array([[1.9, 0.6], [0.0, 0.6], [-1.0, 0.6]]),
           np.array([[0, 1], [1, 2]]))
    obs = circle_loop_cw((-0.5, 0.0), 0.1, n=64)
    return build_segments([bot, top, obs]), (-0.5, 0.0), 0.1


def test_closest_point_square():
    soup = build_segments([box_loop(0.0, 2.0, 0.0, 1.0)])
    x = jnp.asarray([[0.5, 0.3], [1.0, 0.9], [3.0, 0.5], [0.5, -1.0]],
                    dtype=jnp.float32)
    dist, sdist, pt, nrm = queries2d.closest_point(soup, x)
    np.testing.assert_allclose(np.asarray(dist), [0.3, 0.1, 1.0, 1.0],
                               atol=1e-6)
    # inside -> negative
    np.testing.assert_allclose(np.asarray(sdist)[:2], [-0.3, -0.1], atol=1e-6)
    assert np.all(np.asarray(sdist)[2:] > 0)
    assert bool(queries2d.inside(soup, jnp.asarray([0.5, 0.5]))[()])
    assert not bool(queries2d.inside(soup, jnp.asarray([-0.5, 0.5]))[()])


def test_ray_intersect_square():
    soup = build_segments([box_loop(0.0, 2.0, 0.0, 1.0)])
    o = jnp.asarray([[0.5, 0.5], [0.5, 0.5], [0.5, 0.5]], dtype=jnp.float32)
    d = jnp.asarray([[1.0, 0.0], [0.0, -1.0], [-1.0, 0.0]], dtype=jnp.float32)
    tmax = jnp.full((3,), 10.0, dtype=jnp.float32)
    hit, t, pt, nrm = queries2d.ray_intersect(soup, o, d, tmax)
    assert np.all(np.asarray(hit))
    np.testing.assert_allclose(np.asarray(t), [1.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nrm),
                               [[1, 0], [0, -1], [-1, 0]], atol=1e-6)
    # capped ray misses
    hit2, t2, _, _ = queries2d.ray_intersect(soup, o[:1], d[:1],
                                             jnp.asarray([1.0]))
    assert not bool(np.asarray(hit2)[0])
    np.testing.assert_allclose(np.asarray(t2), [1.0])


def test_star_radius_convex_box_is_maximal():
    # convex domain: corners are statically ignored -> star radius = maxR
    soup = build_segments([box_loop(0.0, 2.0, 0.0, 1.0)])
    assert soup.sv.shape[0] == 0 or not np.any(
        np.linalg.norm(np.asarray(soup.sv) < 1e5, axis=-1))
    x = jnp.asarray([[1.0, 0.5]], dtype=jnp.float32)
    r = queries2d.star_radius(soup, x, 1e-3, jnp.asarray([7.0]))
    np.testing.assert_allclose(np.asarray(r), [7.0])


def test_star_radius_obstacle_tangent(karman_like):
    soup, c, rad = karman_like
    # from a point left of the obstacle, the star radius should be about
    # the distance to the circle's tangent (silhouette) points
    x = np.array([[-0.8, 0.0]])
    dc = np.linalg.norm(x[0] - np.asarray(c))
    expect = np.sqrt(dc**2 - rad**2)   # tangent length
    r = queries2d.star_radius(soup, jnp.asarray(x, dtype=jnp.float32),
                              1e-3, jnp.asarray([10.0]))
    np.testing.assert_allclose(np.asarray(r)[0], expect, rtol=0.05)
    # open-chain wall endpoints are always silhouettes
    x2 = jnp.asarray([[-0.9, 0.55]], dtype=jnp.float32)
    r2 = queries2d.star_radius(soup, x2, 1e-3, jnp.asarray([10.0]))
    d_end = np.linalg.norm(np.array([-0.9, 0.55]) - np.array([-1.0, 0.6]))
    assert np.asarray(r2)[0] <= d_end + 1e-5


def test_line_of_sight(karman_like):
    soup, c, rad = karman_like
    a = jnp.asarray([[-0.8, 0.0]], dtype=jnp.float32)
    b = jnp.asarray([[-0.2, 0.0]], dtype=jnp.float32)   # blocked by circle
    assert not bool(np.asarray(queries2d.has_line_of_sight(soup, a, b))[0])
    b2 = jnp.asarray([[-0.8, 0.5]], dtype=jnp.float32)
    assert bool(np.asarray(queries2d.has_line_of_sight(soup, a, b2))[0])


# ------------------------------------------------------------------- 3D ---

def test_tri_closest_point_cube():
    v, f = box_tris((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    soup = build_triangles(v, f)
    # normals must point out of the box
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.9], [2.0, 0.5, 0.5]],
                    dtype=jnp.float32)
    dist, sdist, pt, nrm = queries3d.closest_point(soup, x)
    np.testing.assert_allclose(np.asarray(dist), [0.5, 0.1, 1.0], atol=1e-6)
    assert np.asarray(sdist)[0] < 0 and np.asarray(sdist)[1] < 0
    assert np.asarray(sdist)[2] > 0
    # cube is convex: no silhouette candidates
    assert not np.any(np.asarray(soup.e_always))
    assert np.all(np.asarray(soup.ea) >= 1e5)
    r = queries3d.star_radius(soup, x, 1e-3, jnp.full((3,), 4.0))
    np.testing.assert_allclose(np.asarray(r), 4.0)


def test_tri_ray_cube():
    v, f = box_tris((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    soup = build_triangles(v, f)
    o = jnp.asarray([[0.5, 0.5, 0.5]], dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    hit, t, pt, nrm = queries3d.ray_intersect(soup, o, d, jnp.asarray([9.0]))
    assert bool(np.asarray(hit)[0])
    np.testing.assert_allclose(np.asarray(t), [0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nrm), [[0, 0, 1]], atol=1e-6)


def test_reflex_edges_detected():
    # L-shaped prism has reflex edges along the inner corner
    v = np.array([
        [0, 0, 0], [2, 0, 0], [2, 1, 0], [1, 1, 0], [1, 2, 0], [0, 2, 0],
        [0, 0, 1], [2, 0, 1], [2, 1, 1], [1, 1, 1], [1, 2, 1], [0, 2, 1],
    ], dtype=float)
    # only the two walls meeting at the reflex corner (x=1, y>=1) & (y=1, x>=1)
    f = []
    # wall x=1 for y in [1,2]: outward (into the notch) normal +x
    f += [[3, 4, 10], [3, 10, 9]]
    # wall y=1 for x in [1,2]: outward normal +y
    f += [[3, 9, 8], [3, 8, 2]]
    soup = build_triangles(v, np.asarray(f))
    # the shared vertical edge (1,1,0)-(1,1,1) is reflex w.r.t. the fluid
    ea = np.asarray(soup.ea)
    real = ea[ea[:, 0] < 1e5]
    assert len(real) >= 1
    has_corner = np.any(np.all(np.abs(real[:, :2] - 1.0) < 1e-6, axis=1))
    assert has_corner


def test_obstacle_sdf_factories_are_trace_safe():
    """SceneSpec.obstacle_sdf is a cached_property usually first built
    INSIDE a jit trace; the factory must not bake jnp constants into the
    closure (regression: sdf.sphere leaked a traced constant and
    smoke_obs crashed with UnexpectedTracerError on the second trace)."""
    import jax
    import jax.numpy as jnp
    from nmcfluid.scenes import get_scene

    for name in ("karman", "smoke_obs", "karman3d"):
        spec = get_scene(name)
        x = jnp.zeros((4, spec.dim))
        jax.jit(spec.fluid_mask)(x)              # builds the cached sdf
        out = jax.jit(lambda y: spec.fluid_mask(y))(x)   # reuses it
        assert out.shape == (4,)
