"""Analytic boundary queries must agree with the brute-force segment /
triangle soups they replace."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import queries2d, queries3d
from nmcfluid.geometry.analytic2d import make_analytic2d
from nmcfluid.geometry.analytic3d import make_box3d
from nmcfluid.geometry.soup2d import build_segments, box_loop, circle_loop_cw
from nmcfluid.geometry.soup3d import box_tris, build_triangles
from nmcfluid.scenes.specs import (KARMAN_BBOX, KARMAN_OBS_C, KARMAN_OBS_R,
                                   _karman_boundary, _karman_boundary_soup,
                                   _tg_boundary, _tg_boundary_soup)


def _rand_pts(key, n, lo, hi, dim):
    return jax.random.uniform(key, (n, dim),
                              minval=jnp.asarray(lo),
                              maxval=jnp.asarray(hi))


def _rand_dirs(key, n, dim):
    v = jax.random.normal(key, (n, dim))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_tg_box_analytic_matches_soup():
    ana = _tg_boundary(None)
    soup = _tg_boundary_soup(None)
    k = jax.random.PRNGKey(0)
    x = _rand_pts(k, 256, 0.1, 6.2, 2)
    np.testing.assert_allclose(np.asarray(queries2d.distance(ana, x)),
                               np.asarray(queries2d.distance(soup, x)),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(queries2d.inside(ana, x)),
                                  np.asarray(queries2d.inside(soup, x)))
    d = _rand_dirs(jax.random.PRNGKey(1), 256, 2)
    tmax = jnp.full((256,), 20.0)
    ha, ta, pa, na = queries2d.ray_intersect(ana, x, d, tmax)
    hs, ts, ps, ns = queries2d.ray_intersect(soup, x, d, tmax)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hs))
    np.testing.assert_allclose(np.asarray(ta), np.asarray(ts), atol=1e-3)
    np.testing.assert_allclose(np.asarray(na), np.asarray(ns), atol=1e-4)


def test_karman_analytic_matches_dense_soup():
    """Compare against a 512-gon circle (the analytic circle's limit)."""
    x0, x1, y0, y1 = KARMAN_BBOX
    ana = _karman_boundary(None)
    xs = np.linspace(x0, x1, 21)
    from nmcfluid.geometry.soup2d import polyline_chain
    soup = build_segments([
        polyline_chain(np.stack([xs, np.full_like(xs, y0)], 1)[::-1]),
        polyline_chain(np.stack([xs, np.full_like(xs, y1)], 1)),
        circle_loop_cw(KARMAN_OBS_C, KARMAN_OBS_R, n=512)])
    k = jax.random.PRNGKey(2)
    x = _rand_pts(k, 512, (x0 + 0.05, y0 + 0.05), (x1 - 0.05, y1 - 0.05), 2)
    # keep to the fluid domain: silhouette semantics differ (harmlessly)
    # for points inside the obstacle, where no walk ever runs
    xn = np.asarray(x)
    keep = np.linalg.norm(xn - np.asarray(KARMAN_OBS_C),
                          axis=-1) > KARMAN_OBS_R + 0.01
    x = jnp.asarray(xn[keep])
    n = x.shape[0]
    da = np.asarray(queries2d.distance(ana, x))
    ds = np.asarray(queries2d.distance(soup, x))
    np.testing.assert_allclose(da, ds, atol=2e-4)
    # star radius: tangent distance to the circle vs polygon silhouettes,
    # capped by the wall-corner endpoints
    ra = np.asarray(queries2d.star_radius(ana, x, 1e-3, 10.0))
    rs = np.asarray(queries2d.star_radius(soup, x, 1e-3, 10.0))
    np.testing.assert_allclose(ra, rs, atol=3e-3)
    d = _rand_dirs(jax.random.PRNGKey(3), n, 2)
    tmax = jnp.full((n,), 10.0)
    ha, ta, _, _ = queries2d.ray_intersect(ana, x, d, tmax)
    hs, ts, _, _ = queries2d.ray_intersect(soup, x, d, tmax)
    agree = np.asarray(ha) == np.asarray(hs)
    assert agree.mean() > 0.99          # polygonization edge cases only
    np.testing.assert_allclose(np.asarray(ta)[agree], np.asarray(ts)[agree],
                               atol=2e-3)


def test_cube_analytic_matches_soup():
    ana = make_box3d((-1, -1, -1), (1, 1, 1))
    v, f = box_tris((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    soup = build_triangles(v, f)
    k = jax.random.PRNGKey(4)
    x = _rand_pts(k, 256, -0.95, 0.95, 3)
    np.testing.assert_allclose(np.asarray(queries3d.distance(ana, x)),
                               np.asarray(queries3d.distance(soup, x)),
                               atol=2e-5)
    d = _rand_dirs(jax.random.PRNGKey(5), 256, 3)
    tmax = jnp.full((256,), 10.0)
    ha, ta, _, na = queries3d.ray_intersect(ana, x, d, tmax)
    hs, ts, _, ns = queries3d.ray_intersect(soup, x, d, tmax)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hs))
    np.testing.assert_allclose(np.asarray(ta), np.asarray(ts), atol=1e-3)
    np.testing.assert_allclose(np.asarray(na), np.asarray(ns), atol=1e-4)
    # star radius unconstrained for a convex box
    r = np.asarray(queries3d.star_radius(ana, x, 1e-3,
                                         jnp.full((256,), 2.5)))
    np.testing.assert_allclose(r, 2.5)


def test_wost_solution_matches_between_geometries():
    """The estimator must produce statistically identical solutions on the
    analytic box and the segment-soup box (same PDE, same keys)."""
    from nmcfluid.wost.solver import (WalkSettings, WostScene,
                                      estimate_solution)
    L = 6.279106
    k = 2 * np.pi / L
    sig = 30.0

    def src(x):
        return (sig + 2 * k * k) * jnp.cos(k * (x[..., 0] - 0.000447)) \
            * jnp.cos(k * (x[..., 1] - 0.000447))

    ana = _tg_boundary(None)
    soup = _tg_boundary_soup(None)
    pts = jnp.asarray([[3.14, 3.14], [1.5, 2.0], [4.8, 1.2]], jnp.float32)
    s = WalkSettings(walk_step_cap=64)
    pa, na_, _ = estimate_solution(WostScene(2, ana, src, sig), s, pts,
                                   jax.random.PRNGKey(0), 2000)
    ps, ns_, _ = estimate_solution(WostScene(2, soup, src, sig), s, pts,
                                   jax.random.PRNGKey(0), 2000)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ps), atol=0.03)
