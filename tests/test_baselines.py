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


def test_insr_runner_resume_matches_uncut(tmp_path):
    # a cut-and-resumed INSR run must reproduce the uncut curve exactly
    # (per-frame RNG is fold_in(key, f+1); state round-trips via npz)
    from nmcfluid.baselines.run import main
    tiny = ["--max_n_iters", "60", "--sample_resolution", "8",
            "--grid", "12"]
    a, b = str(tmp_path / "uncut"), str(tmp_path / "cut")
    main(["insr", "--frames", "3", "--out", a] + tiny)
    main(["insr", "--frames", "2", "--out", b] + tiny)
    main(["insr", "--frames", "3", "--out", b, "--resume"] + tiny)
    for f in ("error_insr.txt", "error_insr_refpipe.txt"):
        ea = np.loadtxt(f"{a}/{f}")
        eb = np.loadtxt(f"{b}/{f}")
        assert ea.shape == (3,)
        np.testing.assert_array_equal(ea, eb)
