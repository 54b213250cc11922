"""Bessel-K modal obstacle correction (ops/circle_modes.py): the
deterministic projection's exactness on circle-obstacle scenes."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.ops.circle_modes import (eval_circle_correction,
                                       fit_circle_correction)
from nmcfluid.sim import sampling
from nmcfluid.sim.spectral import grid_gradient, solve_screened_poisson

SS = (0.0, 2.0, 0.0, 2.0)
CENTER = (1.0, 1.0)
RADIUS = 0.15
SIG = 350.0


def _blob_source(grid):
    # smooth divergence blob just off the circle so the obstacle residual
    # is substantial
    d = grid - jnp.asarray([1.35, 1.1])
    return 40.0 * jnp.exp(-jnp.sum(d * d, axis=-1) / 0.02)


def test_modal_field_satisfies_screened_pde():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=24).astype(np.float32)) * 0.1
    B = jnp.asarray(rng.normal(size=24).astype(np.float32)) * 0.1
    x0 = np.array([CENTER[0] + 0.18, CENTER[1] + 0.08], np.float32)
    h = 2e-3
    offs = np.array([[0, 0], [h, 0], [-h, 0], [0, h], [0, -h]], np.float32)
    q, g = eval_circle_correction((A, B), jnp.asarray(x0 + offs),
                                  CENTER, RADIUS, SIG, 24)
    q = np.asarray(q, np.float64)
    lap = (q[1:].sum() - 4 * q[0]) / h ** 2
    np.testing.assert_allclose(lap, SIG * q[0], rtol=0.08)
    # analytic gradient vs central differences
    np.testing.assert_allclose(np.asarray(g)[0, 0], (q[1] - q[2]) / (2 * h),
                               rtol=0.02, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g)[0, 1], (q[3] - q[4]) / (2 * h),
                               rtol=0.02, atol=1e-4)


def test_correction_cancels_circle_neumann_residual():
    grid = sampling.uniform_grid(SS, 512)
    f = _blob_source(grid)
    p0 = solve_screened_poisson(f, SS, SIG)
    g0 = grid_gradient(p0, SS)
    coeffs = fit_circle_correction(g0, SS, CENTER, RADIUS, SIG)

    theta = np.linspace(0.0, 2 * np.pi, 64, endpoint=False)
    ct, st = np.cos(theta), np.sin(theta)
    bpts = jnp.asarray(np.stack([CENTER[0] + RADIUS * ct,
                                 CENTER[1] + RADIUS * st], axis=-1),
                       jnp.float32)
    gx = sampling.bilinear_lookup(g0[..., 0], SS, bpts)
    gy = sampling.bilinear_lookup(g0[..., 1], SS, bpts)
    res_before = np.asarray(gx * ct + gy * st)
    _, gq = eval_circle_correction(coeffs, bpts, CENTER, RADIUS, SIG)
    res_after = res_before + np.asarray(gq[:, 0] * ct + gq[:, 1] * st)
    assert np.abs(res_before).max() > 0.1          # the residual is real
    assert np.abs(res_after).max() < 2e-2 * np.abs(res_before).max()


def test_spectral_with_correction_matches_wost_on_obstacle_scene():
    """Cross-validation on a circle-obstacle domain: the corrected
    deterministic solve must agree with the MC walk (which handles the
    obstacle geometrically) — and the uncorrected box solve must not."""
    from nmcfluid.geometry import build_segments
    from nmcfluid.geometry.soup2d import box_loop, circle_loop_cw
    from nmcfluid.wost.solver import (WalkSettings, WostScene,
                                      estimate_solution)
    grid = sampling.uniform_grid(SS, 256)
    f = _blob_source(grid)
    p0 = solve_screened_poisson(f, SS, SIG)
    g0 = grid_gradient(p0, SS)
    coeffs = fit_circle_correction(g0, SS, CENTER, RADIUS, SIG)

    soup = build_segments([box_loop(0.0, 2.0, 0.0, 2.0, n_per_side=4),
                           circle_loop_cw(CENTER, RADIUS, n=64)])

    def src(y, g):
        return sampling.nearest_lookup(g, SS, y)

    scene = WostScene(dim=2, neumann=soup, source_fn=src, absorption=SIG)
    # points rightward of the circle, inside the correction's reach
    pts = jnp.asarray([[1.22, 1.02], [1.3, 1.18], [1.05, 1.25],
                       [0.82, 1.0], [1.45, 0.95]], jnp.float32)
    p_mc, _, _ = estimate_solution(scene, WalkSettings(walk_step_cap=96),
                                   pts, jax.random.PRNGKey(0), 4000,
                                   source_args=(f,))
    p_box = np.asarray(sampling.bilinear_lookup(p0, SS, pts))
    q, _ = eval_circle_correction(coeffs, pts, CENTER, RADIUS, SIG)
    p_fix = p_box + np.asarray(q)
    err_fix = np.abs(p_fix - np.asarray(p_mc)).max()
    err_box = np.abs(p_box - np.asarray(p_mc)).max()
    assert err_fix < 0.05
    assert err_fix < 0.5 * err_box     # the correction moves toward MC


def test_spectral_projection_rejected_on_noncircle_obstacle():
    import pytest
    from nmcfluid.scenes import get_scene
    from nmcfluid.sim import NeuralFluid
    with pytest.raises(ValueError, match="spectral"):
        NeuralFluid(get_scene("jpipe"), max_n_iters=1,
                    projection="spectral")
