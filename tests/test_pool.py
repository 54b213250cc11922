"""Walker-pool executor (wost/pool.py) correctness.

The pool is a *scheduler*: every walk's randomness is keyed on
(pair, point, per-walk step), so the estimate must be invariant to how
walks are packed into slots — changing pool_slots / pool_refill_every
may only reorder floating-point accumulation. Accuracy itself is gated
against the same manufactured screened-Poisson solution as the lockstep
estimator (tests/test_wost.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import box_loop
from nmcfluid.wost import (WalkSettings, WostScene,
                           estimate_solution_and_gradient)
from nmcfluid.wost.pool import estimate_solution_and_gradient_pool

L = 2.0
SIGMA = 30.0
KX = np.pi / L


def _p_star(x):
    return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])


def _grad_p_star(x):
    gx = -KX * jnp.sin(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])
    gy = -KX * jnp.cos(KX * x[..., 0]) * jnp.sin(KX * x[..., 1])
    return jnp.stack([gx, gy], axis=-1)


def _source(x):
    return (SIGMA + 2.0 * KX ** 2) * _p_star(x)


@pytest.fixture(scope="module")
def scene2d():
    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    return WostScene(dim=2, neumann=soup, source_fn=_source,
                     absorption=SIGMA)


@pytest.fixture(scope="module")
def pts():
    return jax.random.uniform(jax.random.PRNGKey(3), (192, 2),
                              minval=0.3, maxval=1.7)


def test_pool_matches_analytic(scene2d, pts):
    s = WalkSettings(n_walks=192, algo="pool")
    p, g, n = estimate_solution_and_gradient(
        scene2d, s, pts, jax.random.PRNGKey(7))
    assert int(jnp.min(n)) > 150
    err_p = jnp.mean(jnp.abs(p - _p_star(pts)))
    err_g = jnp.mean(jnp.abs(g - _grad_p_star(pts)))
    assert float(err_p) < 0.03
    assert float(err_g) < 0.12


def test_pool_schedule_invariance(scene2d, pts):
    """Same estimates (up to fp re-association) for any slot count and
    refill interval: scheduling must not touch the math."""
    key = jax.random.PRNGKey(11)
    base = WalkSettings(n_walks=64, algo="pool")
    p0, g0, n0 = estimate_solution_and_gradient_pool(scene2d, base, pts, key)
    for over in ({"pool_slots": 256}, {"pool_slots": 4096},
                 {"pool_refill_every": 4}):
        s = dataclasses.replace(base, **over)
        p, g, n = estimate_solution_and_gradient_pool(scene2d, s, pts, key)
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n))
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g),
                                   rtol=2e-3, atol=2e-4)


def test_pool_agrees_with_lockstep(scene2d, pts):
    """Independent RNG realizations of the same estimator: means agree
    within combined MC noise."""
    key = jax.random.PRNGKey(5)
    lk = WalkSettings(n_walks=256, algo="lockstep", walk_step_cap=96)
    pl = WalkSettings(n_walks=256, algo="pool")
    p_a, g_a, _ = estimate_solution_and_gradient(scene2d, lk, pts, key)
    p_b, g_b, _ = estimate_solution_and_gradient(scene2d, pl, pts, key)
    assert float(jnp.mean(jnp.abs(p_a - p_b))) < 0.02
    assert float(jnp.mean(jnp.abs(g_a - g_b))) < 0.12


def test_pool_antithetic_and_cv_reduce_variance(scene2d, pts):
    """The variance-reduction machinery must still engage in pool mode
    (mirrors test_wost.test_gradient_antithetic_and_cv_reduce_variance)."""
    key = jax.random.PRNGKey(9)
    full = WalkSettings(n_walks=128, algo="pool")
    plain = dataclasses.replace(full,
                                use_gradient_antithetic_variates=False,
                                use_gradient_control_variates=False)
    _, g_full, _ = estimate_solution_and_gradient(scene2d, full, pts, key)
    _, g_plain, _ = estimate_solution_and_gradient(scene2d, plain, pts, key)
    err_full = float(jnp.mean((g_full - _grad_p_star(pts)) ** 2))
    err_plain = float(jnp.mean((g_plain - _grad_p_star(pts)) ** 2))
    assert err_full < err_plain


def test_adaptive_walks_accuracy_and_savings():
    """Adaptive allocation (WalkSettings.adaptive_walks): the estimate
    must stay within tolerance of the closed form while spending fewer
    walks on low-variance points (n_valid varies per point and the
    total is well under the fixed budget)."""
    import dataclasses
    import math
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nmcfluid.geometry import build_segments
    from nmcfluid.geometry.soup2d import box_loop
    from nmcfluid.wost import (WalkSettings, WostScene,
                               estimate_solution_and_gradient)

    L, SIG = 2.0, 30.0
    KX = math.pi / L

    def p_star(x):
        return jnp.cos(KX * x[..., 0]) * jnp.cos(KX * x[..., 1])

    def source(x):
        return (SIG + 2.0 * KX ** 2) * p_star(x)

    soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=4)])
    scene = WostScene(dim=2, neumann=soup, source_fn=source, absorption=SIG)
    pts = jnp.asarray([[1.0, 1.0], [0.5, 0.7], [1.5, 0.3], [0.25, 1.7],
                       [0.9, 1.3], [1.7, 1.7]], jnp.float32)
    fixed = WalkSettings(walk_step_cap=96)
    adapt = dataclasses.replace(fixed, adaptive_walks=1.0)
    p_f, g_f, n_f = estimate_solution_and_gradient(
        scene, fixed, pts, jax.random.PRNGKey(0), 4000)
    p_a, g_a, n_a = estimate_solution_and_gradient(
        scene, adapt, pts, jax.random.PRNGKey(0), 4000)
    want_p = np.asarray(p_star(pts))
    np.testing.assert_allclose(np.asarray(p_f), want_p, atol=0.05)
    np.testing.assert_allclose(np.asarray(p_a), want_p, atol=0.08)
    gx = -KX * np.sin(KX * np.asarray(pts)[:, 0]) \
        * np.cos(KX * np.asarray(pts)[:, 1])
    np.testing.assert_allclose(np.asarray(g_a)[:, 0], gx, atol=0.2)
    # no-harm on a variance-homogeneous scene: the optimal allocation
    # degenerates to (near-)uniform, so nothing is starved
    assert int(np.sum(n_a)) > 0.8 * int(np.sum(n_f)), (n_a, n_f)
    assert int(np.min(n_a)) >= 16


def test_adaptive_walks_concentrate_at_the_obstacle():
    """On an obstacle scene the gradient variance peaks near the
    silhouettes; the adaptive allocation must (a) spend its walks there
    and (b) cut the TOTAL spend well below the fixed budget."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nmcfluid.geometry.analytic2d import make_analytic2d
    from nmcfluid.wost import WalkSettings, WostScene, \
        estimate_solution_and_gradient

    # karman-like: open channel walls + circle obstacle, sigma 350
    geom = make_analytic2d((-1e6, 0.0), (1e6, 2.0),
                           circles=[(2.0, 1.0, 0.25)],
                           sil_pts=[(0.0, 0.0), (8.0, 0.0),
                                    (0.0, 2.0), (8.0, 2.0)],
                           bbox=((0.0, 0.0), (8.0, 2.0)))

    def source(x):
        return jnp.sin(x[..., 0]) * jnp.cos(2.0 * x[..., 1])

    scene = WostScene(dim=2, neumann=geom, source_fn=source,
                      absorption=350.0)
    rng = np.random.default_rng(0)
    far = np.stack([rng.uniform(4.5, 7.5, 24),
                    rng.uniform(0.3, 1.7, 24)], 1)
    ang = rng.uniform(0, 2 * np.pi, 8)
    near = np.stack([2.0 + 0.30 * np.cos(ang),
                     1.0 + 0.30 * np.sin(ang)], 1)
    pts = jnp.asarray(np.concatenate([near, far]), jnp.float32)
    fixed = WalkSettings(walk_step_cap=64)
    adapt = dataclasses.replace(fixed, adaptive_walks=1.0)
    _, _, n_f = estimate_solution_and_gradient(
        scene, fixed, pts, jax.random.PRNGKey(1), 500)
    _, _, n_a = estimate_solution_and_gradient(
        scene, adapt, pts, jax.random.PRNGKey(1), 500)
    n_a, n_f = np.asarray(n_a), np.asarray(n_f)
    # (a) near-silhouette points keep (almost) the full budget while a
    # solid share of the far field is cut hard
    assert np.median(n_a[:8]) >= 0.9 * np.median(n_f[:8]), n_a
    assert np.percentile(n_a[8:], 25) < 0.5 * np.median(n_f[8:]), n_a
    # (b) the total spend drops (this toy's far field is only mildly
    # heterogeneous — sin source — so the cut here is modest; the
    # production-scale saving is measured on real karman in PARITY.md)
    assert n_a.sum() < 0.85 * n_f.sum(), (n_a.sum(), n_f.sum())
