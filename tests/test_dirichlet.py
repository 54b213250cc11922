"""Dirichlet-termination coverage for both walk executors.

The fluid projection never poses a Dirichlet boundary (every shipped
config runs ignore_dirichlet with pure-Neumann walls), but the estimator
implements the full mixed-BC walk-on-stars of the reference
(walk_on_stars.h:309-329 termination inside the epsilon shell, :447-459
terminal-contribution accumulation). These tests make that path real:

Manufactured mixed Dirichlet/Neumann problems on the [0,L]^2 box with
Neumann data on the x-walls and Dirichlet data on the y-walls:

  * screened:  (Lap - sigma) p = -f with p* = cos(kx x) cos(kx y),
    kx = pi/L — dp/dx = 0 on x in {0, L} (zero Neumann), p = p* on the
    y-walls (nonzero Dirichlet), f = (sigma + 2 kx^2) p*.
  * pure Laplace (sigma = 0, RR off): p* = cos(kx x) cosh(kx y)/cosh(kx L)
    is harmonic with the same BC split — with Russian roulette disabled
    every *valid* walk terminates ONLY via DONE_DIRICHLET, so the
    estimate isolates the terminal-contribution path exactly.

Both executors are exercised: the lockstep while_loop (solver._walk,
terminal fold at solver.py) and the compacted pool
(pool._scatter_refill's DONE_DIRICHLET branch).
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import polyline_chain
from nmcfluid.wost import (WalkSettings, WostScene, estimate_solution,
                           estimate_solution_and_gradient)

L = 2.0
KX = math.pi / L
SIGMA = 5.0   # mild screening: a large share of walks REACH the Dirichlet
              # wall instead of dying to Russian roulette first


def _neumann_walls():
    # x-walls only; orientation so n = (d.y, -d.x) points out of the fluid
    left = polyline_chain([(0.0, L), (0.0, 0.0)])
    right = polyline_chain([(L, 0.0), (L, L)])
    return build_segments([left, right])


def _dirichlet_walls():
    bottom = polyline_chain([(0.0, 0.0), (L, 0.0)])
    top = polyline_chain([(L, L), (0.0, L)])
    return build_segments([bottom, top])


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])


def _grad_p_star(x):
    gx = -KX * jnp.sin(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])
    gy = -KX * jnp.cos(KX * x[..., 0]) * jnp.sin(KX * x[..., 1])
    return jnp.stack([gx, gy], axis=-1)


def _source(x):
    return (SIGMA + 2.0 * KX ** 2) * _p_star(x)


@pytest.fixture(scope="module")
def mixed_scene():
    return WostScene(dim=2, neumann=_neumann_walls(), source_fn=_source,
                     absorption=SIGMA, dirichlet=_dirichlet_walls(),
                     dirichlet_fn=_p_star)


PTS = jnp.asarray([[1.0, 0.35], [0.5, 0.7], [1.5, 1.65], [0.3, 1.2]],
                  dtype=jnp.float32)


def test_dirichlet_solution_mixed_bc(mixed_scene):
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False)
    p, n_valid, _ = estimate_solution(mixed_scene, settings, PTS,
                                      jax.random.PRNGKey(0), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.05)
    assert np.all(np.asarray(n_valid) > 2000)

    # the terminal g-contribution must be load-bearing: dropping it
    # (reference ignoreDirichlet semantics — walks still TERMINATE at the
    # shell, contribute 0) has to move the estimate well past the noise
    ignore = dataclasses.replace(settings, ignore_dirichlet=True)
    p0, _, _ = estimate_solution(mixed_scene, ignore, PTS,
                                 jax.random.PRNGKey(0), 3000)
    assert float(np.max(np.abs(np.asarray(p0 - p)))) > 0.15


def test_dirichlet_only_termination_pure_laplace():
    # sigma = 0 + RR disabled: valid walks can ONLY end via DONE_DIRICHLET
    def g(x):
        return (jnp.cos(KX * x[..., 0]) * jnp.cosh(KX * x[..., 1])
                / math.cosh(KX * L))

    scene = WostScene(dim=2, neumann=_neumann_walls(),
                      source_fn=lambda x: jnp.zeros(x.shape[:-1]),
                      absorption=0.0, dirichlet=_dirichlet_walls(),
                      dirichlet_fn=g)
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            russian_roulette_threshold=0.0,
                            ignore_source=True)
    p, n_valid, mean_steps = estimate_solution(scene, settings, PTS,
                                               jax.random.PRNGKey(1), 2000)
    # nearly every walk must reach the shell within the cap ...
    assert np.all(np.asarray(n_valid) > 1800), np.asarray(n_valid)
    # ... and the harmonic-measure average of g reproduces p*
    np.testing.assert_allclose(np.asarray(p), np.asarray(g(PTS)), atol=0.04)
    assert float(np.max(np.asarray(mean_steps))) < 100


@pytest.mark.parametrize("algo", ["pool", "lockstep"])
def test_dirichlet_gradient_both_executors(mixed_scene, algo):
    settings = WalkSettings(walk_step_cap=256, ignore_dirichlet=False,
                            algo=algo)
    p, grad, n_sol = estimate_solution_and_gradient(
        mixed_scene, settings, PTS, jax.random.PRNGKey(2), 3000)
    np.testing.assert_allclose(np.asarray(p), np.asarray(_p_star(PTS)),
                               atol=0.06)
    np.testing.assert_allclose(np.asarray(grad),
                               np.asarray(_grad_p_star(PTS)), atol=0.15)
    assert np.all(np.asarray(n_sol) > 2000)
