"""MC boundary-value-caching projection (sim/bem.py BvcProjector).

The production form of zombie's N11 secondary estimator
(boundary_value_caching/{boundary_sampler,splatter}.h): WoSt walks only at
the boundary cache, deterministic FFT volume potential + P-kernel splat
everywhere else. Validated against the manufactured Neumann-exact solution
the BEM tests use (the splat is byte-identical code; the only new error
source is the cache's MC variance) and end-to-end through the fluid step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.scenes.specs import get_scene
from nmcfluid.sim import sampling
from nmcfluid.sim.bem import BvcProjector
from nmcfluid.wost.solver import WostScene


def _wost_scene(scene):
    ss = scene.scene_size
    return WostScene(
        dim=2, neumann=scene.boundary,
        source_fn=lambda y, grid: sampling.nearest_lookup(grid, ss, y),
        absorption=scene.absorption)


@pytest.fixture(scope="module")
def tg_bp():
    scene = get_scene("taylorgreen")
    return BvcProjector(scene, 128, _wost_scene(scene),
                        scene.walk_settings(n_walks=1024),
                        n_boundary=512, eval_chunk=1024)


def test_bvc_constant_solution(tg_bp):
    """u == 1 pairs with f == sigma. The volume potential and the
    constant-shift correction are exact by construction; the cache walk
    estimates of u == 1 carry MC noise, damped through the splat."""
    scene = get_scene("taylorgreen")
    g = jnp.full(tg_bp.res, scene.absorption, jnp.float32)
    ss = scene.scene_size
    pts = sampling.random_points(jax.random.PRNGKey(1), 512, ss)
    p, gp = tg_bp.solve(g, pts, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(p), 1.0, atol=0.02)
    # the gradient splat's MC noise lives in the near-boundary skin (the
    # raw dP kernels amplify cache noise there — zombie regularizes only
    # the VALUE kernels too, splatter.h:232-247 — and the fluid path
    # masks grad p near the boundary, _mask_pressure); in the bulk the
    # kernel decay e^{-sqrt(sigma) r} kills it
    pts = np.asarray(pts)
    d = np.minimum.reduce([pts[:, 0] - ss[0], ss[1] - pts[:, 0],
                           pts[:, 1] - ss[2], ss[3] - pts[:, 1]])
    assert np.abs(np.asarray(gp))[d > 0.05].max() < 0.1


def test_bvc_manufactured_neumann_solution(tg_bp):
    """Same manufactured case as test_bem.py: cos(k x)cos(k y) is
    Neumann-exact on the box, g = (2k^2 + sigma) u*. BVC must land on it
    within the cache's splat-damped MC noise."""
    scene = get_scene("taylorgreen")
    ss = scene.scene_size
    lo, hi = ss[0], ss[1]
    k = 2 * np.pi / (hi - lo)
    sig = scene.absorption
    Rx, Ry = tg_bp.res
    hx, hy = tg_bp.spacing
    X, Y = np.meshgrid(ss[0] + (np.arange(Rx) + 0.5) * hx,
                       ss[2] + (np.arange(Ry) + 0.5) * hy, indexing="ij")
    ustar = lambda x, y: np.cos(k * (x - lo)) * np.cos(k * (y - lo))
    g = (2 * k ** 2 + sig) * ustar(X, Y)
    pts = np.asarray(sampling.random_points(jax.random.PRNGKey(0), 2048, ss))
    p, gp = tg_bp.solve(jnp.asarray(g, jnp.float32), jnp.asarray(pts),
                        jax.random.PRNGKey(9))
    ut = ustar(pts[:, 0], pts[:, 1])
    gt = np.stack(
        [-k * np.sin(k * (pts[:, 0] - lo)) * np.cos(k * (pts[:, 1] - lo)),
         -k * np.cos(k * (pts[:, 0] - lo)) * np.sin(k * (pts[:, 1] - lo))],
        axis=-1)
    d = np.minimum.reduce([pts[:, 0] - lo, hi - pts[:, 0],
                           pts[:, 1] - lo, hi - pts[:, 1]])
    m = d > 0.05
    assert np.abs(np.asarray(p)[m] - ut[m]).max() < 0.02
    assert np.abs(np.asarray(gp)[m] - gt[m]).max() < 0.15
    # everywhere (near-boundary band included) the value stays controlled
    assert np.abs(np.asarray(p) - ut).max() < 0.06


def test_fluid_step_with_bvc_projection():
    """End-to-end: one operator-split step with --projection bvc on the
    obstacle scene produces finite params/pressure."""
    from nmcfluid.sim.fluid import NeuralFluid
    scene = get_scene("karman")
    fluid = NeuralFluid(scene, max_n_iters=20, sample_resolution=8,
                        wost_resolution=16, div_resolution=64,
                        projection="bvc", n_walks=64)
    state = fluid.add_source(fluid.init_state(0))
    state = fluid.step(state)
    assert np.isfinite(float(state.P))
    leaves = jax.tree.leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    pts, p, grad_p, div = fluid._last_projection
    assert np.all(np.isfinite(np.asarray(p)))
    assert np.all(np.isfinite(np.asarray(grad_p)))
