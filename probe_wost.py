import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR','/root/repo/.jax_cache')
import jax as _j
_j.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
_j.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import sys
import time

import jax
import jax.numpy as jnp

from nmcfluid.scenes import get_scene
from nmcfluid.sim import NeuralFluid
from nmcfluid.sim.fluid import _divergence_grid, _pressure_solve
from nmcfluid.wost.solver import WalkSettings

scene = get_scene("taylorgreen")
sizes = [int(s) for s in sys.argv[1:]] or [1024, 4096, 16384]
for n_pts in sizes:
    fl = NeuralFluid(scene, wost_resolution=int(n_pts ** 0.5),
                     walk_settings=WalkSettings(n_walks=int(__import__("os").environ.get("NW","50")),
                                                walk_step_cap=64))
    st = fl.init_state(0)
    t0 = time.time()
    div = _divergence_grid(fl, st.params, st.eps, st.timestep)
    jax.block_until_ready(div)
    print("div ready", time.time()-t0, flush=True)
    pts, valid, p, g = _pressure_solve(fl, div, jax.random.PRNGKey(0),
                                       st.eps, st.timestep)
    jax.block_until_ready((p, g))
    c = time.time() - t0
    t0 = time.time()
    pts, valid, p, g = _pressure_solve(fl, div, jax.random.PRNGKey(1),
                                       st.eps, st.timestep)
    jax.block_until_ready((p, g))
    print(f"pts={n_pts} compile+run={c:.1f}s steady={time.time() - t0:.2f}s "
          f"pmean={float(jnp.mean(p)):.3e}", flush=True)
