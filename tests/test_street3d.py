"""tools_street3d: 3D probe series over checkpoints + CLI end-to-end."""
import json
import os

import numpy as np

from nmcfluid.scenes import get_scene
from nmcfluid.sim import NeuralFluid
from nmcfluid.tools_street3d import main, probe_series_vel
from nmcfluid.utils import save_ckpt


def _fake_run_dir(tmp_path, n_steps=6):
    scene = get_scene("karman3d")
    fluid = NeuralFluid(scene, max_n_iters=1)
    st = fluid.init_state(0)
    model_dir = os.path.join(tmp_path, "model")
    for t in range(n_steps + 1):
        save_ckpt(model_dir, st.params, t)
    return str(tmp_path), fluid, st


def test_probe_series_shape_and_determinism(tmp_path):
    exp, fluid, st = _fake_run_dir(tmp_path, n_steps=5)
    probes = [(0.0, 0.0, -0.2), (0.1, 0.0, -0.2)]
    s = probe_series_vel(exp, get_scene("karman3d"), probes, comp=0)
    assert s.shape == (5, 2)          # frames 1..5, two probes
    assert np.isfinite(s).all()
    # identical weights in every ckpt -> identical probe values per frame
    # (velocity may depend on t through the boundary policy, so compare
    # against a direct evaluation instead of across frames)
    import jax.numpy as jnp
    u1 = np.asarray(fluid.velocity(st.params, jnp.asarray(probes,
                                                          jnp.float32),
                                   eps=st.eps, t=1))
    np.testing.assert_allclose(s[0], u1[:, 0], rtol=1e-6)


def test_cli_writes_metrics_and_png(tmp_path, capsys):
    exp, _, _ = _fake_run_dir(tmp_path, n_steps=6)
    out_png = os.path.join(exp, "street.png")
    main([exp, "--out", out_png])
    lines = capsys.readouterr().out.strip().splitlines()
    m = json.loads(next(l for l in lines if l.startswith("{")))
    # constant-weights run has no developed street: metrics must say so
    # rather than hallucinate a frequency
    assert m["strouhal"] is None
    assert os.path.exists(out_png)
