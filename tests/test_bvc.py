"""Boundary-value-caching estimator vs the manufactured screened-Poisson
solution (same setup as test_wost)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import box_loop
from nmcfluid.wost.bvc import build_cache, evaluate, sample_boundary_uniform
from nmcfluid.wost.solver import WalkSettings, WostScene

L = 2.0
SIGMA = 30.0
KX = np.pi / L


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])


def _source(x):
    return (SIGMA + 2.0 * KX ** 2) * _p_star(x)


@pytest.fixture(scope="module")
def setup():
    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    scene = WostScene(dim=2, neumann=soup, source_fn=_source,
                      absorption=SIGMA)
    return soup, scene


def test_boundary_sampling_uniform(setup):
    soup, _ = setup
    pts, normals, pdf = sample_boundary_uniform(soup, 512,
                                                jax.random.PRNGKey(0))
    p = np.asarray(pts)
    on_edge = (np.abs(p[:, 0]) < 1e-6) | (np.abs(p[:, 0] - L) < 1e-6) \
        | (np.abs(p[:, 1]) < 1e-6) | (np.abs(p[:, 1] - L) < 1e-6)
    assert on_edge.all()
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * L), rtol=1e-5)
    # normals unit, axis-aligned
    n = np.asarray(normals)
    np.testing.assert_allclose(np.abs(n).max(axis=1), 1.0, atol=1e-6)


def test_bvc_matches_manufactured_solution(setup):
    soup, scene = setup
    settings = WalkSettings(walk_step_cap=96)
    key = jax.random.PRNGKey(1)
    cache = build_cache(scene, settings, soup, 512, key, n_walks=800)
    assert np.allclose(np.asarray(cache.normal_derivative), 0.0)
    # MC source samples over the box
    ks, ke = jax.random.split(jax.random.PRNGKey(2))
    n_src = 8192
    src_pts = jax.random.uniform(ks, (n_src, 2), minval=0.0, maxval=L)
    src_pdf = jnp.full((n_src,), 1.0 / (L * L))
    eval_pts = jnp.asarray([[1.0, 1.0], [0.6, 0.8], [1.4, 0.5], [0.5, 1.5]],
                           jnp.float32)
    u = evaluate(scene, cache, eval_pts, src_pts, src_pdf, n_src,
                 radius_clamp=1e-3, kernel_regularization=0.05)
    want = np.asarray(_p_star(eval_pts))
    np.testing.assert_allclose(np.asarray(u), want, atol=0.08)


def test_bvc_gradient_splat(setup):
    """The two-kernel gradient splat (dG, dP; splatter.h:243-247) against
    the manufactured solution's analytic gradient."""
    soup, scene = setup
    settings = WalkSettings(walk_step_cap=96)
    cache = build_cache(scene, settings, soup, 1024, jax.random.PRNGKey(3),
                        n_walks=800)
    n_src = 16384
    src_pts = jax.random.uniform(jax.random.PRNGKey(4), (n_src, 2),
                                 minval=0.0, maxval=L)
    src_pdf = jnp.full((n_src,), 1.0 / (L * L))
    eval_pts = jnp.asarray([[1.0, 1.0], [0.6, 0.8], [1.4, 0.5]], jnp.float32)
    u, g = evaluate(scene, cache, eval_pts, src_pts, src_pdf, n_src,
                    radius_clamp=1e-3, kernel_regularization=0.05,
                    with_gradient=True)
    x, y = eval_pts[..., 0], eval_pts[..., 1]
    want = np.stack([-KX * np.sin(KX * x) * np.cos(KX * y),
                     -KX * np.cos(KX * x) * np.sin(KX * y)], axis=-1)
    np.testing.assert_allclose(np.asarray(g), want, atol=0.2)
    # on-boundary evaluation points: alpha=2 solution, zeroed gradient
    bpts = jnp.asarray([[0.0, 1.0]], jnp.float32)
    ub, gb = evaluate(scene, cache, bpts, src_pts, src_pdf, n_src,
                      radius_clamp=1e-3, kernel_regularization=0.05,
                      with_gradient=True, on_boundary=jnp.asarray([True]))
    assert np.allclose(np.asarray(gb), 0.0)
    np.testing.assert_allclose(np.asarray(ub), np.asarray(_p_star(bpts)),
                               atol=0.15)


def test_bvc_nonzero_neumann_data():
    """Neumann caches carry du/dn = h (boundary_sampler.h:190-196) and the
    G-kernel term of the splat picks it up: manufactured solution
    p* = cos(pi x / (2L)) with nonzero flux on the x = L wall."""
    kx = np.pi / (2.0 * L)
    sigma = 30.0

    def p_star(x):
        return jnp.cos(kx * x[..., 0])

    def source(x):
        return (sigma + kx ** 2) * p_star(x)

    def h_fn(x):
        # outward normal derivative: nonzero only on the x = L wall
        return jnp.where(x[..., 0] > L - 1e-4,
                         -kx * jnp.sin(kx * x[..., 0]), 0.0)

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    scene = WostScene(dim=2, neumann=soup, source_fn=source,
                      absorption=sigma, neumann_fn=h_fn)
    settings = WalkSettings(walk_step_cap=96, ignore_neumann=False)
    cache = build_cache(scene, settings, soup, 1024, jax.random.PRNGKey(5),
                        n_walks=800)
    dn = np.asarray(cache.normal_derivative)
    on_right = np.asarray(cache.pts)[:, 0] > L - 1e-4
    assert np.abs(dn[on_right] + kx * np.sin(kx * L)).max() < 1e-5
    assert np.allclose(dn[~on_right], 0.0)
    n_src = 16384
    src_pts = jax.random.uniform(jax.random.PRNGKey(6), (n_src, 2),
                                 minval=0.0, maxval=L)
    src_pdf = jnp.full((n_src,), 1.0 / (L * L))
    eval_pts = jnp.asarray([[1.0, 1.0], [1.5, 0.7], [0.4, 1.2]], jnp.float32)
    u = evaluate(scene, cache, eval_pts, src_pts, src_pdf, n_src,
                 radius_clamp=1e-3, kernel_regularization=0.05)
    np.testing.assert_allclose(np.asarray(u), np.asarray(p_star(eval_pts)),
                               atol=0.08)


def test_free_poisson_kernel_gradient_matches_finite_differences():
    """grad_x P for all four (dim, lam) branches vs float64 central
    differences of P(x) = -dG/dr (x-y).n/r — regression for the 3D
    Yukawa screening polynomial (z^2 + z + 1)."""
    import numpy as np
    from nmcfluid.wost import bvc

    def P_np(dim, lam, x, y, n):
        d = x - y
        r = np.linalg.norm(d)
        co = float(np.dot(d, n)) / r
        dgdr = np.asarray(bvc._free_dGdr(dim, lam, np.float64(r)))
        return -float(dgdr) * co

    rng = np.random.default_rng(0)
    for dim in (2, 3):
        for lam in (0.0, 30.0, 350.0):
            for _ in range(5):
                y = rng.normal(size=dim)
                n = rng.normal(size=dim)
                n /= np.linalg.norm(n)
                x = y + rng.normal(size=dim) * 0.3
                if np.linalg.norm(x - y) < 0.05:
                    x = y + 0.2 * n
                d = (x - y)[None, None, :]
                r = np.linalg.norm(d, axis=-1)
                got = np.asarray(bvc._free_dP(
                    dim, lam, d, r, n[None, None, :]))[0, 0]
                eps = 1e-6
                fd = np.zeros(dim)
                for k in range(dim):
                    dx = np.zeros(dim)
                    dx[k] = eps
                    fd[k] = (P_np(dim, lam, x + dx, y, n)
                             - P_np(dim, lam, x - dx, y, n)) / (2 * eps)
                # tolerance is relative to the VECTOR magnitude: f32
                # Bessel cancellation leaves a few % on near-zero
                # components (formulas check to 5e-7 in f64); the 3D
                # Yukawa bug this guards against was 50-90% off
                scale = np.max(np.abs(fd)) + 1e-6
                np.testing.assert_allclose(got / scale, fd / scale,
                                           rtol=0.0, atol=3e-2)
