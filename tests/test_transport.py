import os

import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.scenes import get_scene
from nmcfluid.sim import NeuralFluid
from nmcfluid.transport import (advect_density, init_density,
                                taylor_green_truth, tg_velocity_error,
                                transport_rollout)
from nmcfluid.transport.density import raw_velocity_grid
from nmcfluid.utils import save_ckpt, load_ckpt, latest_step


def test_tg_truth_and_error_zero_on_truth():
    t = taylor_green_truth(64)
    assert abs(tg_velocity_error(t, t)) < 1e-12


def test_init_density_taylorgreen_is_speed():
    scene = get_scene("taylorgreen")
    d = np.asarray(init_density(scene, 32))
    assert d.shape == (32, 32)
    assert d.max() <= np.sqrt(2.0) + 1e-5 and d.max() > 0.9


def test_advect_density_uniform_translation():
    # constant velocity field moves the density; total mass roughly conserved
    # away from boundaries
    scene_size = (0.0, 1.0, 0.0, 1.0)
    n = 64
    x = (jnp.arange(n) / n)[:, None] * jnp.ones((1, n))
    d = jnp.exp(-((x - 0.5) ** 2) / 0.01)
    vel = jnp.stack([jnp.ones((n, n)), jnp.zeros((n, n))], -1)
    d1 = advect_density(d, vel, scene_size, 0.1)
    # peak moves +x by 0.1 -> index shift ~6.4 cells
    i0 = int(np.argmax(np.asarray(d)[:, 0]))
    i1 = int(np.argmax(np.asarray(d1)[:, 0]))
    assert 5 <= (i1 - i0) <= 8


def test_vortex_collide_init_has_color():
    scene = get_scene("vortex_collide")
    d, col = init_density(scene, 24)
    assert d.shape == (24, 24, 24) and col.shape == (24, 24, 24, 3)
    assert float(col[..., 0].max()) == 1.0 and float(col[..., 2].max()) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    scene = get_scene("taylorgreen")
    fl = NeuralFluid(scene, max_n_iters=1, sample_resolution=4,
                     wost_resolution=4, div_resolution=8)
    st = fl.init_state(0)
    p = save_ckpt(tmp_path, st.params, 3)
    assert os.path.exists(p)
    params, t = load_ckpt(tmp_path, st.params, 3)
    assert t == 3
    for (a, _), (b, _) in zip(params, st.params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert latest_step(tmp_path) == 3


def test_transport_rollout_yields_errors(tmp_path):
    scene = get_scene("taylorgreen")
    fl = NeuralFluid(scene, max_n_iters=1, sample_resolution=4,
                     wost_resolution=4, div_resolution=8)
    st = fl.init_state(0)
    frames = list(transport_rollout(fl, [st.params, st.params], n=64))
    assert len(frames) == 2
    for t, d, vel, err in frames:
        assert vel.shape == (64, 64, 2)
        assert err is not None and np.isfinite(err)
