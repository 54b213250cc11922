import sys
import time

import jax
import jax.numpy as jnp

from nmcfluid.geometry import build_segments
from nmcfluid.geometry.soup2d import box_loop
from nmcfluid.wost.solver import (WalkSettings, WostScene,
                                  estimate_solution_and_gradient)
from nmcfluid.sim import sampling

mode = sys.argv[1] if len(sys.argv) > 1 else "analytic"
L = 6.28
soup = build_segments([box_loop(0.0, L, 0.0, L, n_per_side=10)])
k = 2 * 3.14159265 / L
ss = (0.0, L, 0.0, L)

if mode == "analytic":
    def src(x):
        return (350.0 + 2 * k * k) * jnp.cos(k * x[..., 0]) \
            * jnp.cos(k * x[..., 1])
    scene = WostScene(dim=2, neumann=soup, source_fn=src, absorption=350.0)
    args = ()
else:
    grid_pts = sampling.uniform_grid(ss, 1000)
    grid = (350.0 + 2 * k * k) * jnp.cos(k * grid_pts[..., 0]) \
        * jnp.cos(k * grid_pts[..., 1])

    def src(x, g):
        return sampling.nearest_lookup(g, ss, x)
    scene = WostScene(dim=2, neumann=soup, source_fn=src, absorption=350.0)
    args = (grid,)

pts = jax.random.uniform(jax.random.PRNGKey(0), (1024, 2), minval=1.0,
                         maxval=5.0)
settings = WalkSettings(n_walks=50, walk_step_cap=64)
t0 = time.time()
p, g, n = estimate_solution_and_gradient(scene, settings, pts,
                                         jax.random.PRNGKey(1),
                                         source_args=args)
jax.block_until_ready((p, g))
print(f"{mode}: compile+run {time.time() - t0:.1f}s "
      f"pmean={float(jnp.mean(p)):.3e}", flush=True)
