"""Double-sided boundary conditions (walk_on_stars.h solveDoubleSided,
pde.h:20-24 dirichletDoubleSided/neumannDoubleSided).

Two manufactured problems, each with a closed form that is WRONG unless
the double-sided mechanics work:

1. Barrier isolation: box [0,L]^2, Neumann top/bottom walls plus a
   full-height interior barrier at x = m solved double-sided, Dirichlet
   left/right walls. The true solution is DISCONTINUOUS across the
   barrier (independent 1D cosine profiles per strip with zero flux at
   the barrier). Right-strip walkers reach the barrier through its
   front face; without the normal flip of walk_on_stars.h:152-159 their
   hemisphere sampling and ray offsets leak them into the left strip,
   where both the source and the terminal Dirichlet value are wrong.

2. Side-selected Dirichlet data: box Neumann walls + interior circle
   Dirichlet boundary with side-dependent values
   g(x, inside) = p*(x) + A * [inside]. The interior solution gains the
   sigma-harmonic disk mode A * I0(sqrt(sigma) rho)/I0(sqrt(sigma) Rc)
   (I0 = modified Bessel, np.i0); the exterior solution is plain p*.
   Estimates on both sides must pick the right branch via the sign of
   the signed distance at termination (walk_on_stars.h:332-341).
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import circle_loop_cw, polyline_chain
from nmcfluid.wost import (WalkSettings, WostScene, estimate_solution,
                           estimate_solution_and_gradient)

L = 2.0
M = 0.8          # barrier position
SIG = 10.0
CL, CR = 1.0, 2.0
KL = math.pi / M
KR = math.pi / (L - M)


def _p_true(x):
    """Piecewise two-strip solution (y-independent)."""
    xx = x[..., 0]
    left = CL * jnp.cos(KL * xx)
    right = CR * jnp.cos(KR * (L - xx))
    return jnp.where(xx < M, left, right)


def _source_barrier(x):
    xx = x[..., 0]
    fl = (SIG + KL ** 2) * CL * jnp.cos(KL * xx)
    fr = (SIG + KR ** 2) * CR * jnp.cos(KR * (L - xx))
    return jnp.where(xx < M, fl, fr)


@pytest.fixture(scope="module")
def barrier_scene():
    # Neumann: top/bottom walls + the interior barrier (double-sided).
    # Wall orientation: normals out of the fluid; the barrier's normal
    # (+1, 0) faces the right strip's walkers head-on (front face).
    bottom = polyline_chain([(0.0, 0.0), (L, 0.0)])
    top = polyline_chain([(L, L), (0.0, L)])
    barrier = polyline_chain([(M, 0.0), (M, L)])
    neumann = build_segments([bottom, top, barrier], double_sided=True)
    left = polyline_chain([(0.0, L), (0.0, 0.0)])
    right = polyline_chain([(L, 0.0), (L, L)])
    dirichlet = build_segments([left, right])
    return WostScene(dim=2, neumann=neumann, source_fn=_source_barrier,
                     absorption=SIG, dirichlet=dirichlet,
                     dirichlet_fn=_p_true)


PTS_L = [[0.3, 1.0], [0.55, 0.5]]
PTS_R = [[1.1, 1.0], [1.6, 1.4]]


def test_barrier_isolates_the_two_strips(barrier_scene):
    pts = jnp.asarray(PTS_L + PTS_R, jnp.float32)
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            solve_double_sided=True)
    p, n_valid, _ = estimate_solution(barrier_scene, settings, pts,
                                      jax.random.PRNGKey(0), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_true(pts)),
                               atol=0.08)
    assert np.all(np.asarray(n_valid) > 2000)


def test_barrier_leaks_without_double_sided(barrier_scene):
    """Right-strip walkers next to the barrier must give a WRONG answer
    when solve_double_sided is off (the un-flipped normal leaks them
    left, where the solution differs by O(1)) — proving the flip is
    load-bearing, not decorative."""
    pts = jnp.asarray([[0.95, 1.0], [1.0, 0.6]], jnp.float32)
    ds = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                      solve_double_sided=True)
    ss = dataclasses.replace(ds, solve_double_sided=False)
    p_ds, _, _ = estimate_solution(barrier_scene, ds, pts,
                                   jax.random.PRNGKey(1), 3000)
    p_ss, _, _ = estimate_solution(barrier_scene, ss, pts,
                                   jax.random.PRNGKey(1), 3000)
    np.testing.assert_allclose(np.asarray(p_ds), np.asarray(_p_true(pts)),
                               atol=0.1)
    assert float(np.max(np.abs(np.asarray(p_ss - p_ds)))) > 0.3


def test_barrier_gradient_both_executors(barrier_scene):
    def grad_true(x):
        xx = np.asarray(x)[:, 0]
        gl = -KL * CL * np.sin(KL * xx)
        gr = KR * CR * np.sin(KR * (L - xx))
        gx = np.where(xx < M, gl, gr)
        return np.stack([gx, np.zeros_like(gx)], axis=-1)

    pts = jnp.asarray([[0.4, 1.0], [1.3, 0.9]], jnp.float32)
    for algo in ("pool", "lockstep"):
        settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                                solve_double_sided=True, algo=algo)
        p, grad, n = estimate_solution_and_gradient(
            barrier_scene, settings, pts, jax.random.PRNGKey(2), 3000)
        np.testing.assert_allclose(np.asarray(p), np.asarray(_p_true(pts)),
                                   atol=0.08, err_msg=algo)
        np.testing.assert_allclose(np.asarray(grad), grad_true(pts),
                                   atol=0.2, err_msg=algo)


# ---------------------------------------------------------------- circle

SIG_C = 30.0
RC = 0.5
CTR = (1.0, 1.0)
AMP = 1.5
KX = math.pi / L


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])


def _u_circle(x):
    """p* outside the circle; p* + AMP * I0(sqrt(sig) rho)/I0(sqrt(sig) Rc)
    inside (the disk's sigma-harmonic mode matching +AMP on the rim)."""
    rho = np.linalg.norm(np.asarray(x) - np.asarray(CTR), axis=-1)
    bump = AMP * np.i0(np.sqrt(SIG_C) * rho) / np.i0(np.sqrt(SIG_C) * RC)
    base = np.asarray(_p_star(jnp.asarray(x)))
    return np.where(rho < RC, base + bump, base)


@pytest.fixture(scope="module")
def circle_scene():
    from nmcfluid.geometry.soup2d import box_loop
    neumann = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    dirichlet = build_segments([circle_loop_cw(CTR, RC, n=64)])

    def source(x):
        return (SIG_C + 2.0 * KX ** 2) * _p_star(x)

    def g_ds(x, inside):
        # contract: `inside` = sign of the signed distance at termination;
        # for the cw-oriented circle soup (normals toward the center) the
        # positive side IS the disk interior
        return _p_star(x) + jnp.where(inside, AMP, 0.0)

    return WostScene(dim=2, neumann=neumann, source_fn=source,
                     absorption=SIG_C, dirichlet=dirichlet,
                     dirichlet_ds_fn=g_ds)


def test_circle_side_selected_dirichlet(circle_scene):
    pts = jnp.asarray([[1.0, 1.0], [1.2, 0.9],        # inside the disk
                       [0.4, 0.4], [1.0, 1.8]],       # outside
                      jnp.float32)
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            solve_double_sided=True)
    p, n_valid, _ = estimate_solution(circle_scene, settings, pts,
                                      jax.random.PRNGKey(3), 3000)
    np.testing.assert_allclose(np.asarray(p), _u_circle(pts), atol=0.06)
    assert np.all(np.asarray(n_valid) > 2000)

    # side selection is load-bearing: a single-sided run with only the
    # OUTSIDE branch misses the +AMP disk mode at interior points
    one_sided = WostScene(
        dim=2, neumann=circle_scene.neumann,
        source_fn=circle_scene.source_fn, absorption=SIG_C,
        dirichlet=circle_scene.dirichlet, dirichlet_fn=_p_star)
    ss = dataclasses.replace(settings, solve_double_sided=False)
    p1, _, _ = estimate_solution(one_sided, ss, pts,
                                 jax.random.PRNGKey(3), 3000)
    inside_gap = np.abs(np.asarray(p1 - p))[:2]
    assert np.all(inside_gap > 0.15), inside_gap
