"""Green's-function modules vs closed forms and double-precision references.

Reference formulas: bindings/zombie/include/zombie/core/distributions.h.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sp

from nmcfluid.ops import greens2d, greens3d


def _np_yukawa2d_ball(lam, R, r):
    mu = np.sqrt(lam)
    G = (sp.k0(mu * r) - sp.i0(mu * r) * sp.k0(mu * R) / sp.i0(mu * R))
    return G / (2 * np.pi)


def _np_yukawa3d_ball(lam, R, r):
    mu = np.sqrt(lam)
    G = np.exp(-mu * r) - np.exp(-mu * R) * np.sinh(mu * r) / np.sinh(mu * R)
    return G / (4 * np.pi * r)


@pytest.mark.parametrize("lam", [1.0, 350.0])
def test_yukawa2d_matches_double(lam):
    g = greens2d.Yukawa2D(lam)
    R = np.float32(0.37)
    r = np.linspace(0.01, R, 64, dtype=np.float32)
    ball = g.make_ball(jnp.full_like(jnp.asarray(r), R))
    got = np.asarray(g.eval(ball, jnp.asarray(r)))
    want = _np_yukawa2d_ball(lam, np.float64(R), r.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-7)

    # dspk vs double: z*(K1 + I1*K0(Z)/I0(Z))
    mu = np.sqrt(lam)
    z = mu * r.astype(np.float64)
    Z = mu * np.float64(R)
    want_dspk = z * (sp.k1(z) + sp.i1(z) * sp.k0(Z) / sp.i0(Z))
    got_dspk = np.asarray(g.dspk(ball, jnp.asarray(r)))
    np.testing.assert_allclose(got_dspk, want_dspk, rtol=5e-4)

    # dspk at r=R equals sphere-area * poissonKernel (Wronskian identity)
    np.testing.assert_allclose(got_dspk[-1],
                               np.asarray(g.pk_over_uniform(ball))[-1],
                               rtol=5e-4)


def test_yukawa2d_large_muR_finite():
    # mu*R ~ 165: I0 overflows unscaled; everything here must stay finite
    g = greens2d.Yukawa2D(350.0)
    R = jnp.asarray([8.8], dtype=jnp.float32)
    ball = g.make_ball(R)
    r = jnp.asarray([4.0], dtype=jnp.float32)
    for v in (g.eval(ball, r), g.dspk(ball, r), g.norm(ball),
              g.pk_over_uniform(ball), g.pk_grad_coeff(ball),
              g.grad_norm(ball, r)):
        assert np.all(np.isfinite(np.asarray(v)))
    # deep in the screened regime the ball kernel approaches free space
    mu = np.sqrt(350.0)
    free = sp.k0(mu * 4.0) / (2 * np.pi)
    np.testing.assert_allclose(np.asarray(g.eval(ball, r))[0], free,
                               rtol=1e-3)


@pytest.mark.parametrize("lam", [1.0, 350.0])
def test_yukawa3d_matches_double(lam):
    g = greens3d.Yukawa3D(lam)
    R = np.float32(0.53)
    r = np.linspace(0.01, R * 0.999, 64, dtype=np.float32)
    ball = g.make_ball(jnp.full_like(jnp.asarray(r), R))
    got = np.asarray(g.eval(ball, jnp.asarray(r)))
    want = _np_yukawa3d_ball(lam, np.float64(R), r.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-7)


@pytest.mark.parametrize("make", [
    lambda: (greens2d.Harmonic2D, 2),
    lambda: (greens2d.Yukawa2D(25.0), 2),
    lambda: (greens3d.Harmonic3D, 3),
    lambda: (greens3d.Yukawa3D(25.0), 3),
])
def test_norm_is_ball_integral(make):
    # norm() must equal the integral of G over the ball: MC-check it
    g, dim = make()
    R = 0.8
    n = 200_000
    rng = np.random.default_rng(0)
    if dim == 2:
        pts = rng.uniform(-R, R, (n, 2))
        pts = pts[np.linalg.norm(pts, axis=1) < R]
        vol = np.pi * R * R
    else:
        pts = rng.uniform(-R, R, (n, 3))
        pts = pts[np.linalg.norm(pts, axis=1) < R]
        vol = 4 / 3 * np.pi * R ** 3
    r = jnp.asarray(np.linalg.norm(pts, axis=1), dtype=jnp.float32)
    ball = g.make_ball(jnp.full_like(r, R))
    vals = np.asarray(g.eval(ball, r))
    integral = vals.mean() * vol
    want = float(np.asarray(g.norm(jax.tree.map(lambda a: a[:1], ball)))[0])
    np.testing.assert_allclose(integral, want, rtol=2e-2)


@pytest.mark.parametrize("make", [
    lambda: (greens2d.Harmonic2D, 2),
    lambda: (greens2d.Yukawa2D(350.0), 2),
    lambda: (greens3d.Harmonic3D, 3),
    lambda: (greens3d.Yukawa3D(350.0), 3),
])
def test_sample_radius_distribution(make):
    # sampled radii must follow radial_pdf: compare mean r against quadrature
    g, dim = make()
    R = 0.3
    n = 60_000
    key = jax.random.PRNGKey(1)
    ball = g.make_ball(jnp.full((n,), R, dtype=jnp.float32))
    r, _ = g.sample_radius(ball, key)
    r = np.asarray(r)
    assert np.all(r > 0) and np.all(r <= R)
    rr = np.linspace(1e-4, R - 1e-6, 20_000, dtype=np.float32)
    pdf = np.asarray(g.radial_pdf(
        g.make_ball(jnp.full_like(jnp.asarray(rr), R)), jnp.asarray(rr)))
    pdf_int = np.trapezoid(pdf, rr)
    np.testing.assert_allclose(pdf_int, 1.0, rtol=2e-2)
    want_mean = np.trapezoid(rr * pdf, rr) / pdf_int
    np.testing.assert_allclose(r.mean(), want_mean, rtol=2e-2)


def test_grad_norm_matches_double():
    # zombie's ball gradient() = (y-c)*gradientNorm is the gradient w.r.t.
    # the pole (it includes the image term), distributions.h:634-647,760-772.
    # Check the f32 scaled forms against f64 transcriptions of those formulas.
    lam = 350.0
    mu = np.sqrt(lam)
    R = np.float64(0.25)
    r = np.linspace(0.03, 0.2, 32)
    z, Z = mu * r, mu * R

    g2 = greens2d.Yukawa2D(lam)
    ball2 = g2.make_ball(jnp.full((32,), np.float32(R)))
    want2 = mu * (sp.k1(z) - sp.i1(z) * sp.k1(Z) / sp.i1(Z)) / (2 * np.pi * r)
    got2 = np.asarray(g2.grad_norm(ball2, jnp.asarray(r, dtype=jnp.float32)))
    np.testing.assert_allclose(got2, want2, rtol=1e-3)

    g3 = greens3d.Yukawa3D(lam)
    ball3 = g3.make_ball(jnp.full((32,), np.float32(R)))
    k32 = np.exp(-z) * (1 + 1 / z)
    i32 = np.cosh(z) - np.sinh(z) / z
    K32Z = np.exp(-Z) * (1 + 1 / Z)
    I32Z = np.cosh(Z) - np.sinh(Z) / Z
    want3 = mu * (k32 - i32 * K32Z / I32Z) / (4 * np.pi * r * r)
    got3 = np.asarray(g3.grad_norm(ball3, jnp.asarray(r, dtype=jnp.float32)))
    np.testing.assert_allclose(got3, want3, rtol=1e-3)

    # harmonic closed forms
    b2 = greens2d.Harmonic2D.make_ball(jnp.full((32,), np.float32(R)))
    np.testing.assert_allclose(
        np.asarray(greens2d.Harmonic2D.grad_norm(b2, jnp.asarray(r, dtype=jnp.float32))),
        (1 / r**2 - 1 / R**2) / (2 * np.pi), rtol=1e-4)
    b3 = greens3d.Harmonic3D.make_ball(jnp.full((32,), np.float32(R)))
    np.testing.assert_allclose(
        np.asarray(greens3d.Harmonic3D.grad_norm(b3, jnp.asarray(r, dtype=jnp.float32))),
        (1 / r**3 - 1 / R**3) / (4 * np.pi), rtol=1e-4)


def test_stable_gradient_ratios_match_naive_at_moderate_Z():
    import jax.numpy as jnp
    from nmcfluid.ops.greens2d import Yukawa2D
    from nmcfluid.ops.greens3d import Yukawa3D
    for G in (Yukawa2D(30.0), Yukawa3D(30.0)):
        ball = G.make_ball(jnp.asarray([0.1, 0.3, 0.6], jnp.float32))
        naive = np.asarray(G.pk_grad_coeff(ball) / G.pk_over_uniform(ball))
        stable = np.asarray(G.pk_grad_over_thr(ball))
        np.testing.assert_allclose(stable, naive, rtol=1e-4)
        r = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
        naive_g = np.asarray(G.grad_norm(ball, r) / G.eval(ball, r))
        stable_g = np.asarray(G.grad_norm_over_eval(ball, r))
        np.testing.assert_allclose(stable_g, naive_g, rtol=1e-3)


def test_stable_gradient_ratios_bounded_at_large_Z():
    """sigma=350 on scene-sized balls: the individual factors underflow
    f32; the joint ratios must stay finite and moderate."""
    import jax.numpy as jnp
    from nmcfluid.ops.greens2d import Yukawa2D
    from nmcfluid.ops.greens3d import Yukawa3D
    for G in (Yukawa2D(350.0), Yukawa3D(350.0)):
        R = jnp.asarray([1.0, 3.0, 6.0], jnp.float32)
        ball = G.make_ball(R)
        assert float(np.asarray(G.pk_over_uniform(ball)).max()) == 0.0 \
            or float(np.asarray(G.pk_over_uniform(ball)).min()) < 1e-20
        s = np.asarray(G.pk_grad_over_thr(ball))
        assert np.all(np.isfinite(s)) and np.all(s > 0) and np.all(s < 1e3)
        r = 0.5 * R
        g = np.asarray(G.grad_norm_over_eval(ball, r))
        assert np.all(np.isfinite(g)) and np.all(np.abs(g) < 1e4)


def test_packed_table_lookup_matches_unpacked():
    """pack_quads/pack_pairs re-layout the inverse-CDF tables so a draw
    costs one gather; values must be bit-identical to the 4-gather
    bilinear (resp. 2-gather linear) lookup of the raw table."""
    import jax
    import jax.numpy as jnp
    from nmcfluid.ops import radial_tables as rt

    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (4096,))
    Z = jnp.exp(jax.random.uniform(jax.random.fold_in(key, 1), (4096,),
                                   minval=-9.0, maxval=7.5))
    for dim in (2, 3):
        table = rt.build_table(dim).astype("float32")
        packed = rt.sample_t_screened_u(rt.pack_quads(table), Z, u)

        tj = jnp.asarray(table)
        zi = (jnp.log(jnp.clip(Z, rt._Z_MIN, rt._Z_MAX))
              - rt._LOG_Z_MIN) / rt._DLOG
        i0 = jnp.clip(jnp.floor(zi).astype(jnp.int32), 0, rt._N_Z - 2)
        wi = jnp.clip(zi - i0, 0.0, 1.0)
        uj = u * (rt._N_U - 1)
        j0 = jnp.clip(jnp.floor(uj).astype(jnp.int32), 0, rt._N_U - 2)
        wj = uj - j0
        ref = ((1 - wi) * ((1 - wj) * tj[i0, j0] + wj * tj[i0, j0 + 1])
               + wi * ((1 - wj) * tj[i0 + 1, j0] + wj * tj[i0 + 1, j0 + 1]))
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(ref))

    h = rt.build_harmonic2d_table().astype("float32")
    packed = rt.sample_t_harmonic2d_u(rt.pack_pairs(h), u)
    hj = jnp.asarray(h)
    uj = u * (rt._N_U - 1)
    j0 = jnp.clip(jnp.floor(uj).astype(jnp.int32), 0, rt._N_U - 2)
    wj = uj - j0
    ref = (1 - wj) * hj[j0] + wj * hj[j0 + 1]
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(ref))


def test_matmul_table_lookup_matches_gather():
    """The gather-free matmul form (sample_t_*_mm, used by the live
    greens classes) must agree with the packed-gather lookup to ~1 ulp.
    The contraction order matches (u-interp first) and the masked rows
    have exactly two nonzeros, but the matmul kernel contracts with FMAs
    (product unrounded before add), so individual draws can differ in
    the last bit; the harmonic path has no matmul and stays exact."""
    import jax
    import jax.numpy as jnp
    from nmcfluid.ops import radial_tables as rt

    key = jax.random.PRNGKey(7)
    u = jnp.concatenate([jax.random.uniform(key, (2048,)),
                         jnp.array([0.0, 1.0, 0.5])])
    Z = jnp.concatenate([
        jnp.exp(jax.random.uniform(jax.random.fold_in(key, 1), (2048,),
                                   minval=-9.0, maxval=9.0)),
        jnp.array([rt._Z_MIN / 10, rt._Z_MAX * 10, 1.0])])
    for dim in (2, 3):
        table = rt.build_table(dim).astype("float32")
        got = rt.sample_t_screened_u_mm(table, Z, u)
        ref = rt.sample_t_screened_u(rt.pack_quads(table), Z, u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)

    h = rt.build_harmonic2d_table().astype("float32")
    got = rt.sample_t_harmonic2d_u_mm(h, u)
    ref = rt.sample_t_harmonic2d_u(rt.pack_pairs(h), u)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
