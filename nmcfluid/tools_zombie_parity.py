"""Direct statistical parity capture vs the reference's C++ WoSt solver.

Runs zombie_bindings.wost (the reference's pybind11 pressure solver,
bindings/zombie/demo/demo.cpp:119-205) and our estimator on ONE recorded
(divergence grid, point cloud) pair at the shipped per-frame config, and
reports mean/std of p and grad p both ways plus relative L2 gaps.

Protocol (the noise floor is measured, not assumed): ours runs twice
with independent seeds (A, B) — |A - B| is pure Monte Carlo noise at the
shipped walk count with identical estimator settings. If |A - Z| (Z =
zombie) is statistically indistinguishable from |A - B| adjusted for
zombie's own variance (~= sqrt(2) x the one-sided noise when variances
match), the two estimators agree within MC noise, i.e. they estimate the
same quantity. BASELINE.md's "velocity L2 within 1%" is checked on the
projected-velocity proxy u_prev - grad p.

The divergence grid is produced exactly as in production: source fit +
one advection fit at shipped hyperparameters, then -div(u_prev) on the
1000^2 cell-centered grid (the reference's get_divergence,
src/2d/models/model_split.py:230-243, also passes -div). The grid is
handed to zombie as its source matrix (Scene ctor 2, demo/scene.h:54-76)
transposed to its mat[int(uv.y*h)][int(uv.x*w)] indexing.

Build notes for zombie_bindings (from BASELINE_WALL.json round-3
capture): the shipped 2D Yukawa kernels overflow f32 at sigma=350
(I0(muR) -> inf -> NaN), fixed by widening the Bessel members/locals to
double in a /tmp copy; taylorgreen's square.obj needs
flipOrientation=true or insideDomain() rejects every point.

Usage: python -m nmcfluid.tools_zombie_parity [--scene taylorgreen]
    [--n_points 8192] [--zombie_build /tmp/zb/build]
    [--out docs/zombie_parity_taylorgreen_r4.json]
"""
import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

WOST_JSON = {
    # examples/{taylorgreen,karman}/wost.json (identical solver blocks)
    "solver": {"nWalks": 500, "maxWalkLength": 10000,
               "epsilonShell": 1e-3, "minStarShapedRadius": 1e-3,
               "ignoreDirichlet": True, "ignoreNeumann": False,
               "ignoreSource": False, "russianRouletteThreshold": 0.99,
               "setpsBeforeApplyingTikhonov": 0},
    "output": {"gridRes": 300, "boundaryDistanceMask": 1e-3},
}
OBJ = {"taylorgreen": "examples/taylorgreen/square.obj",
       "karman": "examples/karman/geometry_1cyl_long_open.obj"}


def rel_l2(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="taylorgreen",
                    choices=["taylorgreen", "karman"])
    ap.add_argument("--n_points", type=int, default=8192)
    ap.add_argument("--zombie_build", default="/tmp/zb/build")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"docs/zombie_parity_{args.scene}_r4.json"

    from nmcfluid.scenes import get_scene
    from nmcfluid.sim.fluid import (NeuralFluid, _divergence_grid,
                                    _fit_advect, _sample_pressure_cloud)
    from nmcfluid.wost.solver import estimate_solution_and_gradient

    scene = get_scene(args.scene)
    fluid = NeuralFluid(scene)
    state = fluid.init_state(0)
    state = fluid.add_source(state)
    key, k1, k2, k3 = jax.random.split(state.key, 4)
    params, _ = _fit_advect(fluid, False, state.params, state.params_prev,
                            state.params_tilde, scene.dt, k1, state.eps,
                            state.timestep)
    div = np.asarray(_divergence_grid(fluid, params, state.eps,
                                      state.timestep))
    pts_all, _valid = _sample_pressure_cloud(fluid, k2)
    pts_all = np.asarray(pts_all).reshape(-1, scene.dim)
    # keep points away from the mask band so neither solver zeroes them
    from nmcfluid.geometry import queries2d
    ndist = np.asarray(queries2d.distance(scene.boundary,
                                          jnp.asarray(pts_all)))
    keep = ndist > 5e-3
    pts = pts_all[keep][:args.n_points].astype(np.float32)
    print(f"{args.scene}: {len(pts)} points, div grid {div.shape}, "
          f"range [{div.min():.3e}, {div.max():.3e}]", flush=True)

    # ---- ours, two independent seeds
    ours = {}
    for tag, kk in (("A", jax.random.PRNGKey(1001)),
                    ("B", jax.random.PRNGKey(2002))):
        t0 = time.time()
        p, grad, n = estimate_solution_and_gradient(
            fluid._wost_scene, fluid.walk_settings, jnp.asarray(pts), kk,
            source_args=(jnp.asarray(div),))
        ours[tag] = (np.asarray(p), np.asarray(grad))
        print(f"ours[{tag}]: {time.time() - t0:.1f}s", flush=True)

    # ---- zombie on the same inputs
    sys.path.insert(0, args.zombie_build)
    import zombie_bindings
    scene_cfg = {"boundary": os.path.join(args.reference, OBJ[args.scene]),
                 "absorptionCoeff": 350.0, "normalizeDomain": False,
                 # square.obj winds so that flipOrientation=False rejects
                 # every interior point (round-3 finding); karman's
                 # scene.obj ships with the orientation zombie expects
                 "flipOrientation": args.scene == "taylorgreen",
                 "isDoubleSided": False,
                 # both shipped configs say isWatertight true (karman's
                 # open channel included - examples/karman/wost.json)
                 "isWatertight": True}
    # zombie indexes the source matrix mat[int(uv.y*h)][int(uv.x*w)];
    # ours is grid[ix, iy] -> transpose
    t0 = time.time()
    zscene = zombie_bindings.Scene(scene_cfg, div.T.tolist())
    _, zp, zgrad = zombie_bindings.wost(
        zscene, WOST_JSON["solver"], WOST_JSON["output"], pts.tolist())
    z_sec = time.time() - t0
    zp = np.asarray(zp, np.float32)
    zgrad = np.asarray(zgrad, np.float32)
    print(f"zombie: {z_sec:.1f}s", flush=True)

    pa, ga = ours["A"]
    pb, gb = ours["B"]
    # p is defined up to a constant under pure Neumann: compare centered
    ctr = lambda v: v - v.mean()
    report = {
        "scene": args.scene, "n_points": int(len(pts)), "n_walks": 500,
        "zombie_sec": round(z_sec, 1),
        "p_mean": {"ours_A": float(pa.mean()), "ours_B": float(pb.mean()),
                   "zombie": float(zp.mean())},
        "p_std": {"ours_A": float(pa.std()), "ours_B": float(pb.std()),
                  "zombie": float(zp.std())},
        "gradp_std": {"ours_A": float(ga.std()), "zombie": float(zgrad.std())},
        # noise floor: ours-vs-ours with independent seeds
        "rel_l2_p_ours_vs_ours": rel_l2(ctr(pa), ctr(pb)),
        "rel_l2_p_ours_vs_zombie": rel_l2(ctr(pa), ctr(zp)),
        "rel_l2_gradp_ours_vs_ours": rel_l2(ga, gb),
        "rel_l2_gradp_ours_vs_zombie": rel_l2(ga, zgrad),
    }
    # BASELINE.md target: projected velocity u_prev - grad p within 1%
    u_prev = np.asarray(fluid.velocity(params, jnp.asarray(pts),
                                       eps=state.eps, t=state.timestep))
    va = u_prev - ga
    vz = u_prev - zgrad
    report["rel_l2_velocity_ours_vs_zombie"] = rel_l2(va, vz)
    report["rel_l2_velocity_ours_vs_ours"] = rel_l2(va, u_prev - gb)
    report["velocity_within_1pct"] = \
        report["rel_l2_velocity_ours_vs_zombie"] < 0.01
    # the decisive statistic: the cross-solver gap relative to the
    # measured two-seed MC noise floor of the SAME estimator settings.
    # <= ~1.1 means the solvers are statistically indistinguishable (any
    # residual estimator bias is buried under walk variance); a literal
    # 1% target is unreachable at 500 walks whenever the noise floor
    # itself exceeds 1% (karman), including for zombie vs itself.
    report["velocity_gap_over_noise_floor"] = round(
        report["rel_l2_velocity_ours_vs_zombie"]
        / max(report["rel_l2_velocity_ours_vs_ours"], 1e-12), 3)
    report["gradp_gap_over_noise_floor"] = round(
        report["rel_l2_gradp_ours_vs_zombie"]
        / max(report["rel_l2_gradp_ours_vs_ours"], 1e-12), 3)
    print(json.dumps(report, indent=1))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
