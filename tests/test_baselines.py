import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.baselines import INSRFluid, PINNFluid, PIDeepONetFluid
from nmcfluid.baselines.common import sample_boundary, tg_velocity


def test_tg_velocity_divergence_free_on_canonical_domain():
    from nmcfluid.ops.diff_ops import divergence
    x = jax.random.uniform(jax.random.PRNGKey(0), (128, 2), minval=-0.9,
                           maxval=0.9)
    d = np.asarray(divergence(tg_velocity, x))
    np.testing.assert_allclose(d, 0.0, atol=2e-5)


def test_sample_boundary_on_walls():
    xv, xh = sample_boundary(jax.random.PRNGKey(1), 64)
    assert np.all(np.abs(np.asarray(xv)[:, 0]) == 1.0)
    assert np.all(np.abs(np.asarray(xh)[:, 1]) == 1.0)


def test_insr_smoke():
    m = INSRFluid(num_hidden_layers=2, hidden_features=32, lr=1e-4,
                  max_n_iters=120, sample_resolution=12, dt=0.01)
    st = m.init()
    st["vel"], i, l = m.fit_source(st["vel"], jax.random.PRNGKey(0))
    assert float(l) < 0.5
    st = m.step(st, jax.random.PRNGKey(1))
    u = m._vel(st["vel"], jnp.zeros((4, 2)))
    assert np.all(np.isfinite(np.asarray(u)))


def test_pinn_smoke():
    m = PINNFluid(num_hidden_layers=2, hidden_features=32, lr=1e-4,
                  max_n_iters=120, sample_resolution=12, t_range=0.01)
    st = m.init()
    st, i, l = m.train(st, jax.random.PRNGKey(0))
    assert np.isfinite(float(l))
    u = m.velocity(st, jnp.zeros((4, 2)), 0.005)
    assert u.shape == (4, 2) and np.all(np.isfinite(np.asarray(u)))


def test_pideeponet_smoke():
    m = PIDeepONetFluid(num_hidden_layers=2, hidden_features=32, lr=1e-4,
                        max_n_iters=120, sample_resolution=12, t_range=0.01)
    st = m.init()
    st, i, l = m.train(st, jax.random.PRNGKey(0))
    assert np.isfinite(float(l))
    u = m.velocity(st, jnp.zeros((4, 2)), 0.005)
    assert u.shape == (4, 2) and np.all(np.isfinite(np.asarray(u)))
