"""Deterministic boundary-element projection (sim/bem.py).

Validates the three stages (FFT volume potential, Nystrom boundary solve,
corrected kernel splat) against manufactured solutions and against the two
independently validated solvers (spectral+modal, WoSt MC) on the scene
geometries the mode targets — including jpipe, the one 2D scene with no
other deterministic path."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.scenes.specs import get_scene
from nmcfluid.sim import sampling
from nmcfluid.sim.bem import (BemProjector, closed_loops,
                              equispaced_boundary)


def _cell_grid(bp, ss):
    Rx, Ry = bp.res
    hx, hy = bp.spacing
    cx = ss[0] + (np.arange(Rx) + 0.5) * hx
    cy = ss[2] + (np.arange(Ry) + 0.5) * hy
    return np.meshgrid(cx, cy, indexing="ij")


@pytest.fixture(scope="module")
def tg_bp():
    return BemProjector(get_scene("taylorgreen"), 128, n_boundary=1024,
                        eval_chunk=1024)


def test_equispaced_boundary_covers_loops():
    loops = closed_loops(get_scene("karman"))
    pts, nrm, w = equispaced_boundary(loops, 512)
    # weights integrate to the total perimeter
    perim = sum(np.linalg.norm(np.roll(v, -1, 0) - v, axis=1).sum()
                for v in loops)
    assert abs(w.sum() - perim) < 1e-9 * perim
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-12)
    # circle samples: outward-of-fluid normals point INTO the circle
    c = np.asarray(get_scene("karman").obstacle_center)
    r = get_scene("karman").obstacle_radius
    on_circ = np.abs(np.hypot(*(pts - c).T) - r) < 1e-3
    assert on_circ.sum() >= 8
    to_center = c - pts[on_circ]
    to_center /= np.linalg.norm(to_center, axis=1, keepdims=True)
    assert np.all(np.sum(nrm[on_circ] * to_center, axis=1) > 0.99)


def test_constant_solution_is_exact(tg_bp):
    """u == 1 pairs with f == sigma; the row-sum diagonal and the
    constant-shift correction make it exact by construction."""
    scene = get_scene("taylorgreen")
    g = jnp.full(tg_bp.res, scene.absorption, jnp.float32)
    pts = sampling.random_points(jax.random.PRNGKey(1), 512,
                                 scene.scene_size)
    p, gp = tg_bp.solve(g, pts)
    np.testing.assert_allclose(np.asarray(p), 1.0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gp), 0.0, atol=1e-4)


def test_manufactured_neumann_solution(tg_bp):
    """cos(k x)cos(k y) with k = 2 pi / L is Neumann-exact on the box;
    (lap - sigma) u* = -(2k^2 + sigma) u* so g = (2k^2 + sigma) u*."""
    scene = get_scene("taylorgreen")
    ss = scene.scene_size
    lo, hi = ss[0], ss[1]
    k = 2 * np.pi / (hi - lo)
    sig = scene.absorption
    X, Y = _cell_grid(tg_bp, ss)
    ustar = lambda x, y: np.cos(k * (x - lo)) * np.cos(k * (y - lo))
    g = (2 * k ** 2 + sig) * ustar(X, Y)
    pts = np.asarray(sampling.random_points(jax.random.PRNGKey(0), 2048, ss))
    p, gp = tg_bp.solve(jnp.asarray(g, jnp.float32), jnp.asarray(pts))
    ut = ustar(pts[:, 0], pts[:, 1])
    gt = np.stack(
        [-k * np.sin(k * (pts[:, 0] - lo)) * np.cos(k * (pts[:, 1] - lo)),
         -k * np.cos(k * (pts[:, 0] - lo)) * np.sin(k * (pts[:, 1] - lo))],
        axis=-1)
    d = np.minimum.reduce([pts[:, 0] - lo, hi - pts[:, 0],
                           pts[:, 1] - lo, hi - pts[:, 1]])
    m = d > 0.05     # clear of the near-cache splat band (~1 spacing)
    assert np.abs(np.asarray(p)[m] - ut[m]).max() < 3e-3
    assert np.abs(np.asarray(gp)[m] - gt[m]).max() < 4e-2
    # everywhere (band included) the value splat stays controlled
    assert np.abs(np.asarray(p) - ut).max() < 8e-3


def test_karman_matches_spectral_modal():
    """On the circle-obstacle scene both deterministic paths solve the same
    closed-box problem: BEM must agree with DCT + Bessel-K modal
    correction (ops/circle_modes.py, itself WoSt-cross-validated)."""
    from nmcfluid.ops.circle_modes import (eval_circle_correction,
                                           fit_circle_correction)
    from nmcfluid.sim.spectral import grid_gradient, solve_screened_poisson
    scene = get_scene("karman")
    ss = scene.scene_size
    sig = scene.absorption
    bp = BemProjector(scene, 192, n_boundary=1024, eval_chunk=1024)
    X, Y = _cell_grid(bp, ss)
    g = np.sin(3.0 * X) * np.cos(4.0 * Y) + 0.5 * np.cos(7.0 * X * Y)
    gj = jnp.asarray(g, jnp.float32)

    pts, valid = sampling.fluid_points(jax.random.PRNGKey(3), 4096, scene)
    p_b, gp_b = bp.solve(gj, pts)

    p_grid = solve_screened_poisson(gj, ss, sig)
    g_grid = grid_gradient(p_grid, ss)
    p_s = sampling.bilinear_lookup(p_grid, ss, pts)
    gp_s = jnp.stack([sampling.bilinear_lookup(g_grid[..., i], ss, pts)
                      for i in range(2)], axis=-1)
    coeffs = fit_circle_correction(g_grid, ss, scene.obstacle_center,
                                   scene.obstacle_radius, sig)
    q, gq = eval_circle_correction(coeffs, pts, scene.obstacle_center,
                                   scene.obstacle_radius, sig)
    p_s = np.asarray(p_s + q)
    gp_s = np.asarray(gp_s + gq)

    pts = np.asarray(pts)
    c = np.asarray(scene.obstacle_center)
    d = np.minimum.reduce([
        np.abs(np.hypot(pts[:, 0] - c[0], pts[:, 1] - c[1])
               - scene.obstacle_radius),
        pts[:, 1] - ss[2], ss[3] - pts[:, 1],
        pts[:, 0] - ss[0], ss[1] - pts[:, 0]])
    m = np.asarray(valid) & (d > 0.05)
    scale_p = np.abs(p_s[m]).max()
    scale_g = np.abs(gp_s[m]).max()
    assert np.abs(np.asarray(p_b) - p_s)[m].max() < 0.02 * scale_p
    assert np.abs(np.asarray(gp_b) - gp_s)[m].max() < 0.02 * scale_g


def test_jpipe_matches_wost():
    """jpipe is the scene BEM exists for (polygonal duct, no spectral
    path): cross-check against the MC estimator on a smooth source."""
    from nmcfluid.geometry import sdf
    from nmcfluid.wost.solver import WostScene, estimate_solution
    scene = get_scene("jpipe")
    ss = scene.scene_size
    bp = BemProjector(scene, 192, n_boundary=1024, eval_chunk=512)
    X, Y = _cell_grid(bp, ss)
    g = np.sin(2.5 * X + 1.0) * np.cos(3.0 * Y)
    gj = jnp.asarray(g, jnp.float32)

    pts, valid = sampling.fluid_points(jax.random.PRNGKey(5), 256, scene)
    dwall = np.asarray(sdf.jpipe_walls()(pts))
    sel = np.asarray(valid) & (dwall > 0.06)
    pts_s = jnp.asarray(np.asarray(pts)[sel][:16])

    p_b, _ = bp.solve(gj, pts_s)
    wsc = WostScene(
        dim=2, neumann=scene.boundary,
        source_fn=lambda y, grid: sampling.nearest_lookup(grid, ss, y),
        absorption=scene.absorption)
    p_w, _, _ = estimate_solution(wsc, scene.walk_settings(n_walks=256),
                                  pts_s, jax.random.PRNGKey(11),
                                  source_args=(gj,))
    scale = np.abs(np.asarray(p_w)).max()
    # the gap is the MC noise of 256 walks (~5% worst-point)
    assert np.abs(np.asarray(p_b) - np.asarray(p_w)).max() < 0.12 * scale


def test_fluid_step_with_bem_projection():
    """End-to-end: one operator-split step with --projection bem runs and
    produces finite params/pressure on the obstacle scene."""
    from nmcfluid.sim.fluid import NeuralFluid
    scene = get_scene("karman")
    fluid = NeuralFluid(scene, max_n_iters=20, sample_resolution=8,
                        wost_resolution=16, div_resolution=64,
                        projection="bem")
    state = fluid.add_source(fluid.init_state(0))
    state = fluid.step(state)
    assert np.isfinite(float(state.P))
    leaves = jax.tree.leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    pts, p, grad_p, div = fluid._last_projection
    assert np.all(np.isfinite(np.asarray(p)))
    assert np.all(np.isfinite(np.asarray(grad_p)))
