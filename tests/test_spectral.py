import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.sim import sampling
from nmcfluid.sim.spectral import grid_gradient, solve_screened_poisson

L = 2.0
SIG = 30.0
K = np.pi / L
SS = (0.0, L, 0.0, L)


def _p_star(x):
    return jnp.cos(K * x[..., 0]) * jnp.cos(K * x[..., 1])


def test_dct_solver_matches_manufactured_solution():
    grid = sampling.uniform_grid(SS, 128)
    f = (SIG + 2 * K ** 2) * _p_star(grid)        # -(lap - sig) p* = -f
    p = solve_screened_poisson(f, SS, SIG)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(grid)),
                               atol=2e-4)


def test_dct_solver_poisson_zero_mean():
    grid = sampling.uniform_grid(SS, 64)
    f = 2 * K ** 2 * _p_star(grid)
    p = solve_screened_poisson(f, SS, 0.0)
    got = np.asarray(p)
    np.testing.assert_allclose(got - got.mean(),
                               np.asarray(_p_star(grid)), atol=1e-3)


def test_grid_gradient_of_cosine():
    grid = sampling.uniform_grid(SS, 128)
    p = _p_star(grid)
    g = np.asarray(grid_gradient(p, SS))
    gx = -K * np.sin(K * np.asarray(grid)[..., 0]) \
        * np.cos(K * np.asarray(grid)[..., 1])
    np.testing.assert_allclose(g[1:-1, :, 0], gx[1:-1], atol=5e-3)
    # one-sided first-order stencils at the walls: O(h) there
    np.testing.assert_allclose(g[[0, -1], :, 0], gx[[0, -1]], atol=5e-2)


def test_wost_agrees_with_spectral_on_same_divergence():
    """Cross-validation: the MC projection and the deterministic DCT solver
    must produce the same pressure from the same divergence grid."""
    from nmcfluid.geometry import build_segments
    from nmcfluid.geometry.soup2d import box_loop
    from nmcfluid.wost.solver import (WalkSettings, WostScene,
                                      estimate_solution)
    grid = sampling.uniform_grid(SS, 256)
    f = (SIG + 2 * K ** 2) * _p_star(grid)
    p_dct = solve_screened_poisson(f, SS, SIG)

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])

    def src(y, g):
        return sampling.nearest_lookup(g, SS, y)

    scene = WostScene(dim=2, neumann=soup, source_fn=src, absorption=SIG)
    pts = jnp.asarray([[1.0, 1.0], [0.5, 0.7], [1.5, 1.5]], jnp.float32)
    p_mc, _, _ = estimate_solution(scene, WalkSettings(walk_step_cap=96),
                                   pts, jax.random.PRNGKey(0), 3000,
                                   source_args=(f,))
    # sample the DCT solution at the same points
    p_ref = sampling.nearest_lookup(p_dct, SS, pts)
    np.testing.assert_allclose(np.asarray(p_mc), np.asarray(p_ref),
                               atol=0.05)
