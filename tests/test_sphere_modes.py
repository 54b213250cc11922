"""Modified-spherical-Bessel sphere correction (ops/sphere_modes.py):
the 3D deterministic projection's obstacle-awareness."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from nmcfluid.ops.sphere_modes import (_poly_consts, _real_sph_harm, _rho,
                                       eval_sphere_correction,
                                       fit_sphere_correction)
from nmcfluid.sim import sampling
from nmcfluid.sim.spectral import grid_gradient, solve_screened_poisson

SS = (-0.5, 0.5, -0.5, 0.5, -0.5, 0.5)
CENTER = (0.0, 0.0, -0.3)     # smoke_obs sphere
RADIUS = 0.1
SIG = 350.0


def _k_l(l, z):
    return math.sqrt(math.pi / (2.0 * z)) * sps.kv(l + 0.5, z)


def test_rho_matches_scipy():
    z0 = math.sqrt(SIG) * RADIUS
    n_l = 12
    bs, s = _poly_consts(z0, n_l)
    r = np.linspace(RADIUS, 0.45, 40)
    z = np.sqrt(SIG) * r
    got = np.asarray(_rho(jnp.asarray(z, jnp.float32), z0, bs))
    for l in range(n_l):
        want = np.array([_k_l(l, zz) / _k_l(l, z0) for zz in z])
        np.testing.assert_allclose(got[:, l], want, rtol=5e-4)
    # log-derivative constants vs f64 finite differences
    h = 1e-6
    for l in range(n_l):
        fd = (math.log(_k_l(l, z0 + h)) - math.log(_k_l(l, z0 - h))) \
            / (2 * h)
        np.testing.assert_allclose(s[l], fd, rtol=1e-5)


def test_real_harmonics_orthonormal():
    n_l = 8
    n_t, n_p = 24, 48
    xg, wg = np.polynomial.legendre.leggauss(n_t)
    ct = jnp.asarray(np.repeat(xg, n_p), jnp.float32)
    w = np.repeat(wg, n_p) * (2.0 * np.pi / n_p)
    phi = jnp.asarray(np.tile(np.arange(n_p) * 2 * np.pi / n_p, n_t),
                      jnp.float32)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    Y = np.asarray(_real_sph_harm(ct, st, phi, n_l))
    gram = (Y * w[:, None]).T @ Y
    np.testing.assert_allclose(gram, np.eye(n_l * n_l), atol=2e-5)


def test_modal_field_satisfies_screened_pde():
    n_l = 10
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=n_l * n_l).astype(np.float32)) * 0.1
    x0 = np.array([0.12, 0.05, -0.21], np.float32)   # ~0.16 off center
    h = 1.5e-3
    offs = [np.zeros(3)]
    for ax in range(3):
        for sgn in (+1, -1):
            e = np.zeros(3)
            e[ax] = sgn * h
            offs.append(e)
    q, g = eval_sphere_correction(c, jnp.asarray(x0 + np.stack(offs),
                                                 jnp.float32),
                                  CENTER, RADIUS, SIG, n_l)
    q = np.asarray(q, np.float64)
    lap = (q[1:].sum() - 6.0 * q[0]) / h ** 2
    np.testing.assert_allclose(lap, SIG * q[0], rtol=0.1)
    for ax in range(3):
        fd = (q[1 + 2 * ax] - q[2 + 2 * ax]) / (2 * h)
        np.testing.assert_allclose(np.asarray(g)[0, ax], fd, rtol=0.03,
                                   atol=2e-4)


def test_correction_cancels_sphere_neumann_residual():
    grid = sampling.uniform_grid(SS, 96)
    d = grid - jnp.asarray([0.15, 0.05, -0.25])
    f = 40.0 * jnp.exp(-jnp.sum(d * d, axis=-1) / 0.01)
    p0 = solve_screened_poisson(f, SS, SIG)
    g0 = grid_gradient(p0, SS)
    coeffs = fit_sphere_correction(g0, SS, CENTER, RADIUS, SIG)

    rng = np.random.default_rng(1)
    ct = rng.uniform(-1, 1, 256)
    phi = rng.uniform(0, 2 * np.pi, 256)
    st = np.sqrt(1 - ct ** 2)
    nrm = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    # probe just OFF the surface: exactly at r = a the interior clamp in
    # eval (max(|x-c|, a)) zeroes the autodiff radial derivative on the
    # clamped branch (production clouds never sample the surface itself)
    bpts = jnp.asarray(np.asarray(CENTER) + RADIUS * 1.003 * nrm,
                       jnp.float32)
    g_at = np.stack([np.asarray(sampling.bilinear_lookup(
        g0[..., i], SS, bpts)) for i in range(3)], -1)
    res_before = np.sum(g_at * nrm, -1)
    _, gq = eval_sphere_correction(coeffs, bpts, CENTER, RADIUS, SIG)
    res_after = res_before + np.sum(np.asarray(gq) * nrm, -1)
    # the modal solve must kill the bulk of the normal-derivative
    # residual (the remainder is grid-interpolation + truncation error)
    assert np.abs(res_after).max() < 0.05 * np.abs(res_before).max(), (
        np.abs(res_before).max(), np.abs(res_after).max())
    assert np.sqrt(np.mean(res_after ** 2)) \
        < 0.05 * np.sqrt(np.mean(res_before ** 2))
