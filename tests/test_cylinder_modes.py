"""Cylinder modal obstacle correction (ops/cylinder_modes.py): the 3D
deterministic projection's obstacle-awareness on karman3d's geometry."""
import math

import jax.numpy as jnp
import numpy as np

from nmcfluid.ops.cylinder_modes import (eval_cylinder_correction,
                                         fit_cylinder_correction)
from nmcfluid.sim import sampling
from nmcfluid.sim.spectral import grid_gradient, solve_screened_poisson

SS = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
CXZ = (0.0, -0.8)      # karman3d cylinder (src/3d/main.py:92-94)
RADIUS = 0.1
SIG = 350.0


def test_modal_field_satisfies_screened_pde():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)) * 0.05
    B = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)) * 0.05
    x0 = np.array([0.13, 0.31, -0.71], np.float32)   # rho ~ 0.16
    h = 1.5e-3
    offs = [np.zeros(3)]
    for ax in range(3):
        for sgn in (+1, -1):
            e = np.zeros(3)
            e[ax] = sgn * h
            offs.append(e)
    q, g = eval_cylinder_correction((A, B), jnp.asarray(x0 + np.stack(offs),
                                                        jnp.float32),
                                    SS, CXZ, RADIUS, SIG, 16, 8)
    q = np.asarray(q, np.float64)
    lap = (q[1:].sum() - 6.0 * q[0]) / h ** 2
    np.testing.assert_allclose(lap, SIG * q[0], rtol=0.1)
    for ax in range(3):
        fd = (q[1 + 2 * ax] - q[2 + 2 * ax]) / (2 * h)
        np.testing.assert_allclose(np.asarray(g)[0, ax], fd, rtol=0.05,
                                   atol=3e-4)


def test_correction_cancels_cylinder_neumann_residual():
    grid = sampling.uniform_grid(SS, 96)
    d = grid - jnp.asarray([0.2, 0.3, -0.62])
    f = 40.0 * jnp.exp(-jnp.sum(d * d, axis=-1) / 0.02)
    p0 = solve_screened_poisson(f, SS, SIG)
    g0 = grid_gradient(p0, SS)
    coeffs = fit_cylinder_correction(g0, SS, CXZ, RADIUS, SIG)

    rng = np.random.default_rng(1)
    theta = rng.uniform(0, 2 * np.pi, 256)
    yy = rng.uniform(-0.95, 0.95, 256)
    nrm = np.stack([np.cos(theta), np.zeros_like(theta),
                    np.sin(theta)], -1)
    # probe just OFF the surface (in-cylinder clamp, as sphere/circle)
    bpts = jnp.asarray(np.stack(
        [CXZ[0] + 1.003 * RADIUS * np.cos(theta), yy,
         CXZ[1] + 1.003 * RADIUS * np.sin(theta)], -1), jnp.float32)
    g_at = np.stack([np.asarray(sampling.bilinear_lookup(
        g0[..., i], SS, bpts)) for i in range(3)], -1)
    res_before = np.sum(g_at * nrm, -1)
    _, gq = eval_cylinder_correction(coeffs, bpts, SS, CXZ, RADIUS, SIG)
    res_after = res_before + np.sum(np.asarray(gq) * nrm, -1)
    assert np.sqrt(np.mean(res_after ** 2)) \
        < 0.08 * np.sqrt(np.mean(res_before ** 2)), (
        np.sqrt(np.mean(res_before ** 2)), np.sqrt(np.mean(res_after ** 2)))
    assert np.abs(res_after).max() < 0.15 * np.abs(res_before).max()
