"""3D mixed-BC coverage for both walk executors (round-4 verdict ask #5).

The reference's walk is dim-templated and equally live in 3D via
zombie3d (walk_on_stars.h:309-341); until round 5 this repo's Dirichlet
termination / terminal-fold / double-sided paths were tested 2D-only.
These are the Tri3D analogs of tests/test_dirichlet.py and
tests/test_doublesided.py:

  * mixed screened Poisson on the [0,L]^3 box: Neumann x/y walls,
    Dirichlet z walls, p* = cos(kx x) cos(kx z), f = (sigma + 2 kx^2) p*
    — dp*/dn = 0 on every Neumann face, nonzero Dirichlet data on the
    z faces, so DONE_DIRICHLET termination carries the answer;
  * double-sided interior barrier plane x = M with y/z-independent
    two-strip profiles (the 3D lift of the 2D barrier problem): a
    right-strip walker reaches the barrier through its front face and
    must keep walking on its own side (walk_on_stars.h:152-159), and
    the terminal Dirichlet fold runs on Tri3D geometry.
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import box_tris, build_triangles
from nmcfluid.wost import (WalkSettings, WostScene, estimate_solution,
                           estimate_solution_and_gradient)

L = 2.0
KX = math.pi / L
SIGMA = 5.0


def _faces_of(axis):
    """(verts, faces) of the box's two walls normal to `axis`."""
    v, f = box_tris((0.0, 0.0, 0.0), (L, L, L))
    # box_tris face order: z walls 0-3, y walls 4-7, x walls 8-11
    sel = {2: f[0:4], 1: f[4:8], 0: f[8:12]}[axis]
    return v, sel


def _tri_soup(*axes):
    v, f0 = box_tris((0.0, 0.0, 0.0), (L, L, L))
    f = np.concatenate([_faces_of(a)[1] for a in axes])
    return build_triangles(v, f)


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 2])


def _grad_p_star(x):
    gx = -KX * jnp.sin(KX * x[..., 0]) * jnp.cos(KX * x[..., 2])
    gz = -KX * jnp.cos(KX * x[..., 0]) * jnp.sin(KX * x[..., 2])
    return jnp.stack([gx, jnp.zeros_like(gx), gz], axis=-1)


def _source(x):
    return (SIGMA + 2.0 * KX ** 2) * _p_star(x)


@pytest.fixture(scope="module")
def mixed_scene3d():
    return WostScene(dim=3, neumann=_tri_soup(0, 1), source_fn=_source,
                     absorption=SIGMA, dirichlet=_tri_soup(2),
                     dirichlet_fn=_p_star)


PTS = jnp.asarray([[1.0, 1.0, 0.4], [0.5, 0.7, 1.6], [1.5, 1.4, 1.0]],
                  dtype=jnp.float32)


def test_dirichlet_solution_mixed_bc_3d(mixed_scene3d):
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False)
    p, n_valid, _ = estimate_solution(mixed_scene3d, settings, PTS,
                                      jax.random.PRNGKey(0), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.06)
    assert np.all(np.asarray(n_valid) > 2000)
    # the terminal g-fold is load-bearing
    ignore = dataclasses.replace(settings, ignore_dirichlet=True)
    p0, _, _ = estimate_solution(mixed_scene3d, ignore, PTS,
                                 jax.random.PRNGKey(0), 3000)
    assert float(np.max(np.abs(np.asarray(p0 - p)))) > 0.1


@pytest.mark.parametrize("algo", ["pool", "lockstep"])
def test_dirichlet_gradient_both_executors_3d(mixed_scene3d, algo):
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            algo=algo)
    p, grad, n_sol = estimate_solution_and_gradient(
        mixed_scene3d, settings, PTS, jax.random.PRNGKey(2), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.07, err_msg=algo)
    np.testing.assert_allclose(np.asarray(grad),
                               np.asarray(_grad_p_star(PTS)), atol=0.17,
                               err_msg=algo)
    assert np.all(np.asarray(n_sol) > 2000)


# ------------------------------------------------ double-sided barrier

M = 0.8
CL, CR = 1.0, 2.0
KL = math.pi / M
KR = math.pi / (L - M)
SIG_B = 10.0


def _p_true_b(x):
    xx = x[..., 0]
    return jnp.where(xx < M, CL * jnp.cos(KL * xx),
                     CR * jnp.cos(KR * (L - xx)))


def _source_b(x):
    xx = x[..., 0]
    fl = (SIG_B + KL ** 2) * CL * jnp.cos(KL * xx)
    fr = (SIG_B + KR ** 2) * CR * jnp.cos(KR * (L - xx))
    return jnp.where(xx < M, fl, fr)


@pytest.fixture(scope="module")
def barrier_scene3d():
    # Neumann: y/z walls + the interior barrier plane (normal +x faces
    # the right strip); Dirichlet: x walls with the two-strip truth
    v, _ = box_tris((0.0, 0.0, 0.0), (L, L, L))
    v = np.concatenate([v, [[M, 0.0, 0.0], [M, L, 0.0],
                            [M, L, L], [M, 0.0, L]]])
    fy = _faces_of(1)[1]
    fz = _faces_of(2)[1]
    # winding so (b-a)x(c-a) = +x
    fbar = np.asarray([[8, 9, 10], [8, 10, 11]])
    neumann = build_triangles(v, np.concatenate([fy, fz, fbar]))
    dirichlet = _tri_soup(0)
    return WostScene(dim=3, neumann=neumann, source_fn=_source_b,
                     absorption=SIG_B, dirichlet=dirichlet,
                     dirichlet_fn=_p_true_b)


PTS_B = jnp.asarray([[0.3, 1.0, 1.0], [0.55, 0.5, 1.3],
                     [1.1, 1.0, 1.0], [1.6, 1.4, 0.6]], jnp.float32)


def test_barrier_isolates_strips_3d(barrier_scene3d):
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            solve_double_sided=True)
    p, n_valid, _ = estimate_solution(barrier_scene3d, settings, PTS_B,
                                      jax.random.PRNGKey(3), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_true_b(PTS_B)),
                               atol=0.1)
    assert np.all(np.asarray(n_valid) > 2000)
    # the front-face normal flip is load-bearing next to the barrier
    near = jnp.asarray([[0.95, 1.0, 1.0], [1.0, 0.6, 1.2]], jnp.float32)
    ss = dataclasses.replace(settings, solve_double_sided=False)
    p_ds, _, _ = estimate_solution(barrier_scene3d, settings, near,
                                   jax.random.PRNGKey(4), 3000)
    p_ss, _, _ = estimate_solution(barrier_scene3d, ss, near,
                                   jax.random.PRNGKey(4), 3000)
    np.testing.assert_allclose(np.asarray(p_ds),
                               np.asarray(_p_true_b(near)), atol=0.15)
    assert float(np.max(np.abs(np.asarray(p_ss - p_ds)))) > 0.3


@pytest.mark.parametrize("algo", ["pool", "lockstep"])
def test_barrier_gradient_both_executors_3d(barrier_scene3d, algo):
    def grad_true(x):
        xx = np.asarray(x)[:, 0]
        gl = -KL * CL * np.sin(KL * xx)
        gr = KR * CR * np.sin(KR * (L - xx))
        gx = np.where(xx < M, gl, gr)
        return np.stack([gx, np.zeros_like(gx), np.zeros_like(gx)], -1)

    pts = jnp.asarray([[0.4, 1.0, 1.0], [1.3, 0.9, 1.1]], jnp.float32)
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            solve_double_sided=True, algo=algo)
    p, grad, n = estimate_solution_and_gradient(
        barrier_scene3d, settings, pts, jax.random.PRNGKey(5), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_true_b(pts)),
                               atol=0.1, err_msg=algo)
    np.testing.assert_allclose(np.asarray(grad), grad_true(pts),
                               atol=0.3, err_msg=algo)
