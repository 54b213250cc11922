"""Generation-lockstep executor (wost/gen.py, round 5).

The gen executor shares the pool's RNG stream construction — start
draws keyed on (pair, point), continuation draws on (step, pair*N +
point) — so for every (pair, point) it walks the SAME trajectory the
pool does. The executors must therefore agree to floating-point
reduction order, and both must reproduce the analytic solutions the
estimator suite already pins.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import box_loop
from nmcfluid.wost import (WalkSettings, WostScene,
                           estimate_solution_and_gradient)

L = 2.0
SIG = 30.0
KX = math.pi / L


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])


@pytest.fixture(scope="module")
def box_scene():
    def source(x):
        return (SIG + 2.0 * KX ** 2) * _p_star(x)

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    return WostScene(dim=2, neumann=soup, source_fn=source,
                     absorption=SIG)


PTS = jnp.asarray([[1.0, 1.0], [0.4, 0.7], [1.5, 1.6], [0.2, 1.1]],
                  jnp.float32)


def test_gen_matches_pool_same_streams(box_scene):
    """Same (pair, point) streams => near-identical estimates (the only
    difference is summation order)."""
    kw = dict(walk_step_cap=64, pool_step_cap=64, gen_step_cap=64)
    p_p, g_p, n_p = estimate_solution_and_gradient(
        box_scene, WalkSettings(algo="pool", **kw), PTS,
        jax.random.PRNGKey(3), 256)
    p_g, g_g, n_g = estimate_solution_and_gradient(
        box_scene, WalkSettings(algo="gen", **kw), PTS,
        jax.random.PRNGKey(3), 256)
    # identical walk sets => identical valid counts
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_g))
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_g),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_g),
                               rtol=2e-3, atol=2e-4)


def test_gen_solves_manufactured_problem(box_scene):
    settings = WalkSettings(algo="gen")
    p, grad, n = estimate_solution_and_gradient(
        box_scene, settings, PTS, jax.random.PRNGKey(0), 2000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.05)
    gx = -KX * np.sin(KX * np.asarray(PTS)[:, 0]) \
        * np.cos(KX * np.asarray(PTS)[:, 1])
    gy = -KX * np.cos(KX * np.asarray(PTS)[:, 0]) \
        * np.sin(KX * np.asarray(PTS)[:, 1])
    np.testing.assert_allclose(np.asarray(grad), np.stack([gx, gy], -1),
                               atol=0.15)
    assert np.all(np.asarray(n) > 1700)


def test_gen_group_padding_unbiased(box_scene):
    """n_pairs not divisible by the group size: padded pairs must not
    contribute (masked by `live`)."""
    s_small = WalkSettings(algo="gen", gen_group_pairs=7)
    s_big = WalkSettings(algo="gen", gen_group_pairs=4)
    p1, _, n1 = estimate_solution_and_gradient(
        box_scene, s_small, PTS, jax.random.PRNGKey(5), 50)
    p2, _, n2 = estimate_solution_and_gradient(
        box_scene, s_big, PTS, jax.random.PRNGKey(5), 50)
    # same pair set (0..24) either way -> same walks -> same counts
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-4, atol=2e-5)


def test_gen_dirichlet_terminal_fold():
    from nmcfluid.geometry.soup2d import polyline_chain
    left = polyline_chain([(0.0, L), (0.0, 0.0)])
    right = polyline_chain([(L, 0.0), (L, L)])
    neumann = build_segments([left, right])
    bottom = polyline_chain([(0.0, 0.0), (L, 0.0)])
    top = polyline_chain([(L, L), (0.0, L)])
    dirichlet = build_segments([bottom, top])
    sig = 5.0

    def source(x):
        return (sig + 2.0 * KX ** 2) * _p_star(x)

    scene = WostScene(dim=2, neumann=neumann, source_fn=source,
                      absorption=sig, dirichlet=dirichlet,
                      dirichlet_fn=_p_star)
    settings = WalkSettings(algo="gen", ignore_dirichlet=False,
                            gen_step_cap=256)
    p, grad, n = estimate_solution_and_gradient(
        scene, settings, PTS, jax.random.PRNGKey(2), 2000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.06)
    assert np.all(np.asarray(n) > 1500)
