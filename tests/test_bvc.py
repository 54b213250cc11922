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
