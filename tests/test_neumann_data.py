"""Nonzero Neumann boundary data through the WALK estimator's
single-sample boundary term (walk_on_stars.h:212-260; solver._advance's
|G|-weighted boundary pick) — 2D segments and, new in round 4, 3D
triangles (closing the solver.py NotImplementedError the round-3 verdict
flagged: the reference's sampleNeumann works in 3D,
fcpw_scene_loader.h:599-620).

Manufactured: p* = cos(k x_axis) with k = pi/(2L) — normal derivative
vanishes on every wall except x_axis = L, where h = -k sin(k L) = -k.
f = (sigma + k^2) p*.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import (box_tris, build_segments, build_triangles)
from nmcfluid.geometry.soup2d import box_loop
from nmcfluid.wost import (WalkSettings, WostScene, estimate_solution,
                           estimate_solution_and_gradient)

L = 2.0
SIG = 30.0
K = math.pi / (2.0 * L)


def _scene_2d():
    def p_star(x):
        return jnp.cos(K * x[..., 0])

    def source(x):
        return (SIG + K ** 2) * p_star(x)

    def h_fn(x):
        return jnp.where(x[..., 0] > L - 1e-4,
                         -K * jnp.sin(K * x[..., 0]), 0.0)

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    return WostScene(dim=2, neumann=soup, source_fn=source,
                     absorption=SIG, neumann_fn=h_fn), p_star


def test_walk_estimator_2d_nonzero_neumann():
    scene, p_star = _scene_2d()
    pts = jnp.asarray([[1.0, 1.0], [1.7, 0.6], [0.5, 1.4]], jnp.float32)
    settings = WalkSettings(walk_step_cap=96, ignore_neumann=False)
    p, n_valid, _ = estimate_solution(scene, settings, pts,
                                      jax.random.PRNGKey(0), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_star(pts)),
                               atol=0.06)
    assert np.all(np.asarray(n_valid) > 2500)
    # dropping the boundary term must shift the near-wall estimate by
    # the screened flux extension (~ k * e^{-sqrt(sig) d} scale) and
    # leave it strictly farther from the closed form
    off = WalkSettings(walk_step_cap=96, ignore_neumann=True)
    p0, _, _ = estimate_solution(scene, off, pts, jax.random.PRNGKey(0),
                                 3000)
    shift = abs(float(p0[1] - p[1]))
    assert shift > 0.02, shift
    truth = float(p_star(pts)[1])
    assert abs(float(p0[1]) - truth) > abs(float(p[1]) - truth)


@pytest.mark.parametrize("algo", ["pool", "lockstep"])
def test_walk_estimator_2d_neumann_gradient(algo):
    scene, p_star = _scene_2d()
    pts = jnp.asarray([[1.2, 1.0], [0.7, 0.6]], jnp.float32)
    settings = WalkSettings(walk_step_cap=96, ignore_neumann=False,
                            algo=algo)
    # nonzero Neumann data runs in BOTH executors since round 5 (the
    # |G|-weighted boundary pick consumes plain per-step uniforms)
    p, grad, n = estimate_solution_and_gradient(
        scene, settings, pts, jax.random.PRNGKey(1), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_star(pts)),
                               atol=0.06)
    gx = -K * np.sin(K * np.asarray(pts)[:, 0])
    want = np.stack([gx, np.zeros_like(gx)], -1)
    np.testing.assert_allclose(np.asarray(grad), want, atol=0.15)


def test_walk_estimator_3d_nonzero_neumann():
    def p_star(x):
        return jnp.cos(K * x[..., 2])

    def source(x):
        return (SIG + K ** 2) * p_star(x)

    def h_fn(x):
        return jnp.where(x[..., 2] > L - 1e-4,
                         -K * jnp.sin(K * x[..., 2]), 0.0)

    v, f = box_tris((0.0, 0.0, 0.0), (L, L, L))
    soup = build_triangles(v, f)
    scene = WostScene(dim=3, neumann=soup, source_fn=source,
                      absorption=SIG, neumann_fn=h_fn)
    pts = jnp.asarray([[1.0, 1.0, 1.0], [0.6, 1.3, 1.8], [1.4, 0.5, 0.4]],
                      jnp.float32)
    settings = WalkSettings(walk_step_cap=96, ignore_neumann=False)
    p, n_valid, _ = estimate_solution(scene, settings, pts,
                                      jax.random.PRNGKey(2), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_star(pts)),
                               atol=0.07)
    assert np.all(np.asarray(n_valid) > 2500)
    # the 3D boundary term is load-bearing near the z = L wall
    off = WalkSettings(walk_step_cap=96, ignore_neumann=True)
    p0, _, _ = estimate_solution(scene, off, pts, jax.random.PRNGKey(2),
                                 3000)
    shift = abs(float(p0[1] - p[1]))
    assert shift > 0.015, shift
    truth = float(p_star(pts)[1])
    assert abs(float(p0[1]) - truth) > abs(float(p[1]) - truth)
