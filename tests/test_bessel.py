import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sp

from nmcfluid.ops import bessel


@pytest.mark.parametrize("fn,ref", [
    (bessel.k0e, sp.k0e),
    (bessel.k1e, sp.k1e),
])
def test_scaled_bessel_vs_scipy(fn, ref):
    x = np.concatenate([
        np.geomspace(1e-6, 2.0, 200),
        np.linspace(2.0, 50.0, 200),
        np.geomspace(50.0, 5e3, 50),
    ]).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x)))
    want = ref(x.astype(np.float64)).astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_scaled_identities_finite_at_extremes():
    x = jnp.asarray([1e-7, 1e-3, 1.0, 88.0, 500.0, 1e4], dtype=jnp.float32)
    for fn in (bessel.k0e, bessel.k1e, bessel.i0e, bessel.i1e):
        assert np.all(np.isfinite(np.asarray(fn(x))))


def test_wronskian():
    # I0(z)K1(z) + I1(z)K0(z) = 1/z, in scaled form (i0e*k1e + i1e*k0e) = 1/z
    z = jnp.asarray(np.geomspace(0.01, 300.0, 100), dtype=jnp.float32)
    lhs = bessel.i0e(z) * bessel.k1e(z) + bessel.i1e(z) * bessel.k0e(z)
    np.testing.assert_allclose(np.asarray(lhs), 1.0 / np.asarray(z),
                               rtol=2e-4)
