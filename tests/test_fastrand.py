import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.ops import fastrand as fr


def _draws(step, salt, n=1 << 16, seed=1234):
    lanes = fr.lane_iota((n,))
    return np.asarray(fr.uniform(jnp.uint32(seed), step, salt, lanes))


def test_uniform_range_mean_var():
    u = _draws(3, 1)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 3e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3


def test_streams_decorrelated_across_step_salt_seed():
    base = _draws(3, 1)
    for other in (_draws(4, 1), _draws(3, 2),
                  _draws(3, 1, seed=99)):
        r = np.corrcoef(base, other)[0, 1]
        assert abs(r) < 0.02, r
    # lane-adjacent correlation
    r = np.corrcoef(base[:-1], base[1:])[0, 1]
    assert abs(r) < 0.02, r


def test_equidistribution_chi2():
    u = _draws(7, 5, n=1 << 18)
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 63 dof: mean 63, std ~11; generous bound
    assert chi2 < 140, chi2


def test_seed_from_key_distinct():
    s1 = fr.seed_from_key(jax.random.PRNGKey(0))
    s2 = fr.seed_from_key(jax.random.PRNGKey(1))
    assert int(s1) != int(s2)
