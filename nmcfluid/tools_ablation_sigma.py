"""Screening-weight ablation snapshots (final_material/screening_weight).

The reference publishes the karman first-projection *pressure field* at
absorptionCoeff sigma in {50, 100, 350} (weight=NN.png: viridis,
limits +-0.02, obstacle blanked): larger sigma localizes the screened
response around the cylinder AND shortens/denoises the MC walks. This
tool reproduces those snapshots with the MC (WoSt) estimator — the MC
path is the point: the published sigma=50 image is visibly noisier than
sigma=350, which is a solver-variance statement, so the deterministic
projections would miss it.

`python -m nmcfluid.tools_ablation_sigma [--sigmas 50 100 350]
 [--res 256] [--out docs/ablations]`
"""
import argparse
import dataclasses
import os

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="karman")
    ap.add_argument("--sigmas", type=float, nargs="+",
                    default=[50.0, 100.0, 350.0])
    ap.add_argument("--res", type=int, default=256,
                    help="vertical grid resolution of the snapshot")
    ap.add_argument("--n_walks", type=int, default=None)
    ap.add_argument("--max_n_iters", type=int, default=None,
                    help="IC-fit iteration cap (tests)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="points per walk launch (default: the fluid's "
                         "wost_chunk)")
    ap.add_argument("--walk_step_cap", type=int, default=None)
    ap.add_argument("--vlim", type=float, default=0.02)
    ap.add_argument("--out", default="docs/ablations")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .scenes import get_scene
    from .sim import NeuralFluid
    from .sim.fluid import _divergence_grid
    from .sim import sampling
    from .wost.solver import estimate_solution_and_gradient

    base = get_scene(args.scene)
    for sigma in args.sigmas:
        scene = dataclasses.replace(base, absorption=float(sigma))
        fluid = NeuralFluid(scene, max_n_iters=args.max_n_iters)
        state = fluid.init_state(0)
        state = fluid.add_source(state)      # IC fit -> realistic div field
        div = _divergence_grid(fluid, state.params, state.eps,
                               state.timestep)

        ss = scene.scene_size
        aspect = (ss[1] - ss[0]) / (ss[3] - ss[2])
        ny, nx = args.res, int(round(args.res * aspect))
        xs = np.linspace(ss[0], ss[1], nx, dtype=np.float32)
        ys = np.linspace(ss[2], ss[3], ny, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        pts = np.stack([gx, gy], -1).reshape(-1, 2)

        ws_kw = dict(n_walks=args.n_walks or scene.n_walks)
        if args.walk_step_cap:
            ws_kw["walk_step_cap"] = args.walk_step_cap
        ws = scene.walk_settings(**ws_kw)
        p_parts = []
        chunk = args.chunk or fluid.wost_chunk
        for i in range(0, pts.shape[0], chunk):
            sub = pts[i:i + chunk]
            pad = chunk - sub.shape[0]
            if pad:
                sub = np.concatenate([sub, sub[:1].repeat(pad, 0)])
            p, grad_p, _ = estimate_solution_and_gradient(
                fluid._wost_scene, ws, jax.numpy.asarray(sub),
                jax.random.PRNGKey(int(sigma) * 1000 + i),
                source_args=(div,))
            p_parts.append(np.asarray(p)[:chunk - pad if pad else chunk])
        p = np.concatenate(p_parts).reshape(ny, nx)

        # blank the obstacle interior like the published figures
        if scene.obstacle_center is not None:
            d = np.hypot(gx - scene.obstacle_center[0],
                         gy - scene.obstacle_center[1])
            p = np.where(d < scene.obstacle_radius, np.nan, p)

        fig, ax = plt.subplots(
            figsize=(10, 10 / aspect + 1.2), constrained_layout=True)
        im = ax.imshow(p, origin="lower", cmap="viridis",
                       vmin=-args.vlim, vmax=args.vlim,
                       extent=(ss[0], ss[1], ss[2], ss[3]))
        ax.set_axis_off()
        fig.colorbar(im, ax=ax, fraction=0.025)
        path = os.path.join(args.out, f"sigma_{int(sigma)}.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        finite = p[np.isfinite(p)]
        print(f"sigma={sigma}: wrote {path}  p range "
              f"[{finite.min():.4f}, {finite.max():.4f}]  "
              f"std {finite.std():.5f}", flush=True)


if __name__ == "__main__":
    main()
