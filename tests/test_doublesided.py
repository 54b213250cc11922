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


def test_flipped_resets_every_step():
    """The double-sided normal-flip flag is PER-STEP state: the reference
    reinitialises flipNormalOrientation to false at every step top
    (walk_on_stars.h:152-159) and only re-raises it when the walker sits
    on the Neumann boundary after a front-face arrival. A lane that
    arc-steps into the interior must therefore come out with
    flipped=False — the round-4 advisor found the old code carrying the
    stale True into later steps' neumann_ds_fn aligned flags."""
    from nmcfluid.geometry.soup2d import box_loop
    from nmcfluid.wost.solver import _advance, _fresh_state

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=2)],
                          double_sided=True)
    scene = WostScene(dim=2, neumann=soup,
                      source_fn=lambda x: jnp.zeros(x.shape[:-1]),
                      absorption=SIG)
    settings = WalkSettings(solve_double_sided=True)
    # deep-interior lane with a small first radius: the step CANNOT hit
    x = jnp.asarray([[1.0, 1.0]], jnp.float32)
    st = _fresh_state(x, flipped=jnp.ones((1,), bool),
                      first_radius=jnp.full((1,), 0.05, jnp.float32))
    draw = lambda salt, shape: jnp.full(shape, 0.37, jnp.float32)
    st2 = _advance(scene, scene.greens(), settings, st, draw)
    assert not bool(st2.flipped[0])
    assert not bool(st2.on_neumann[0])


# --------------------------- nonzero side-dependent barrier flux
# Each strip's manufactured profile has NONZERO normal derivative at the
# barrier, with near-opposite values on the two sides:
#   p_L = CL2 cos(aL x)        h_L = dp_L/dn_out,L = dp_L/dx(M)  (n=+x)
#   p_R = CR2 cos(aR (L-x))    h_R = -dp_R/dx(M)                 (n=-x)
# The walk reads the data through neumann_ds_fn(x, aligned): aligned=True
# iff the estimate runs on the side the barrier's geometric normal (+1,0)
# points into — the right strip (walk_on_stars.h:221-253). Walls keep
# h = 0 on both sides (their true flux: the strips are y-independent).

CL2, CR2 = 1.0, 1.5
AL, AR = 2.0, 3.0
H_L = -CL2 * AL * math.sin(AL * M)            # dp_L/dx at M  (~ -2.0)
H_R = -CR2 * AR * math.sin(AR * (L - M))      # -dp_R/dx at M, n_out = -x
                                              # (~ +2.0: sin(3.6) < 0)


def _p_true_flux(x):
    xx = x[..., 0]
    return jnp.where(xx < M, CL2 * jnp.cos(AL * xx),
                     CR2 * jnp.cos(AR * (L - xx)))


def _source_flux(x):
    xx = x[..., 0]
    fl = (SIG + AL ** 2) * CL2 * jnp.cos(AL * xx)
    fr = (SIG + AR ** 2) * CR2 * jnp.cos(AR * (L - xx))
    return jnp.where(xx < M, fl, fr)


def _flux_scene(h_ds):
    bottom = polyline_chain([(0.0, 0.0), (L, 0.0)])
    top = polyline_chain([(L, L), (0.0, L)])
    barrier = polyline_chain([(M, 0.0), (M, L)])
    neumann = build_segments([bottom, top, barrier], double_sided=True)
    left = polyline_chain([(0.0, L), (0.0, 0.0)])
    right = polyline_chain([(L, 0.0), (L, L)])
    dirichlet = build_segments([left, right])
    return WostScene(dim=2, neumann=neumann, source_fn=_source_flux,
                     absorption=SIG, dirichlet=dirichlet,
                     dirichlet_fn=_p_true_flux, neumann_ds_fn=h_ds)


@pytest.mark.parametrize("algo", ["pool", "lockstep"])
def test_barrier_nonzero_flux_side_selected(algo):
    """End-to-end nonzero Neumann data under double-sided BCs through
    BOTH executors (the pool handles boundary data since round 5 — the
    old silent lockstep fallback at solver.py is gone). Also proves the
    aligned flag is load-bearing: feeding the right-strip flux to both
    sides wrecks the left strip."""
    def h_ds(x, aligned):
        on_barrier = jnp.abs(x[..., 0] - M) < 1e-4
        return jnp.where(on_barrier, jnp.where(aligned, H_R, H_L), 0.0)

    scene = _flux_scene(h_ds)
    pts = jnp.asarray([[0.45, 1.0], [0.6, 0.55], [1.05, 1.0], [1.5, 1.4]],
                      jnp.float32)
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            ignore_neumann=False, solve_double_sided=True,
                            algo=algo)
    p, grad, n = estimate_solution_and_gradient(
        scene, settings, pts, jax.random.PRNGKey(5), 4000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_true_flux(pts)),
                               atol=0.12, err_msg=algo)
    assert np.all(np.asarray(n) > 3000)

    # aligned ignored -> the left strip reads h_R (+2.0) instead of
    # h_L (-2.0): near-barrier left points shift by O(1)
    wrong = _flux_scene(lambda x, aligned: jnp.where(
        jnp.abs(x[..., 0] - M) < 1e-4, H_R, 0.0))
    pw, _, _ = estimate_solution_and_gradient(
        wrong, settings, pts, jax.random.PRNGKey(5), 4000)
    gap = np.abs(np.asarray(pw - p))
    assert float(gap[:2].max()) > 0.3, gap


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
