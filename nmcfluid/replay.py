"""Checkpoint replay tools: kinetic-energy curves and field re-rendering.

`python -m nmcfluid.replay <scene> --exp DIR {energy|vorticity|velocity}`

Replaces src/3d/infer.py (energy curve over checkpoints, :16-39) and
src/3d/draw.py (vorticity re-render, :26-37).
"""
import argparse
import os

import numpy as np

from .scenes import get_scene, SCENES
from .sim import NeuralFluid
from .sim import sampling
from .utils import load_ckpt, latest_step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("scene", choices=sorted(SCENES))
    p.add_argument("what", choices=["energy", "vorticity", "velocity"])
    p.add_argument("--exp", required=True, help="experiment dir (with model/)")
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--fmt", choices=["infer", "run"], default="infer",
                   help="energy output format: 'infer' = Ek_r<res>.txt "
                        "(0.5*sum u^2, infer.py:16-39); 'run' = regenerate "
                        "the run dir's energy.txt (0.5*mean u^2 per frame, "
                        "run.py's kinetic_energy minus the mean-pressure "
                        "term P, which checkpoints do not store)")
    args = p.parse_args(argv)

    scene = get_scene(args.scene)
    fluid = NeuralFluid(scene, max_n_iters=1)
    res = args.resolution or scene.vel_vis_resolution
    model_dir = os.path.join(args.exp, "model")
    last = latest_step(model_dir)
    if last < 0:
        raise SystemExit(f"no checkpoints under {model_dir}")
    st = fluid.init_state(0)

    if args.what == "energy":
        # infer.py:16-39: Ek = 0.5 sum u^2 on the vis grid, plus source Ek
        eks = []
        means = []
        for t in range(last + 1):
            params, _ = load_ckpt(model_dir, st.params, t)
            u = np.asarray(fluid.velocity(params,
                                          sampling.uniform_grid(
                                              scene.scene_size, res, True),
                                          eps=st.eps, t=t))
            eks.append(0.5 * float(np.sum(u ** 2)))
            means.append(0.5 * float(np.mean(u ** 2)))
        if args.fmt == "run":
            # regenerate energy.txt for a run dir whose curve was cut by a
            # pre-fix resume; row k = energy after step k+1, so drop the
            # frame-0 checkpoint row to match run.py's convention
            out = os.path.join(args.exp, "energy.txt")
            np.savetxt(out, np.asarray(means[1:]))
            print(f"wrote {out} ({len(means) - 1} frames, 0.5*mean|u|^2; "
                  "the per-run mean-pressure offset P is not in ckpts)")
            return
        pts = sampling.uniform_grid(scene.scene_size, res, True)
        ek_src = 0.5 * float(np.sum(
            np.asarray(scene.source_velocity(pts)) ** 2))
        out = os.path.join(args.exp, f"Ek_r{res}.txt")
        with open(out, "w") as f:
            print(f"Ek src:\n{ek_src}", file=f)
            print("Ek list:", file=f)
            for e in eks:
                print(e, file=f)
        print(f"wrote {out} ({len(eks)} frames)")
        return

    from .utils import vis
    from .ops.diff_ops import curl2d
    save_dir = os.path.join(args.exp, f"{args.what}_{res}")
    os.makedirs(save_dir, exist_ok=True)
    for t in range(last + 1):
        params, _ = load_ckpt(model_dir, st.params, t)
        grid = sampling.uniform_grid(scene.scene_size, res)
        if args.what == "vorticity" and scene.dim == 2:
            w = np.asarray(curl2d(
                lambda x: fluid.velocity(params, x, eps=st.eps, t=t), grid))
            vis.draw_scalar_field2d(
                w, os.path.join(save_dir, f"vorticity_t{t:03d}.png"),
                vmin=-5, vmax=5)
        else:
            u = np.asarray(fluid.velocity(params, grid, eps=st.eps, t=t))
            if scene.dim == 2:
                g = np.asarray(grid)
                vis.draw_vector_field2d(
                    u[..., 0], u[..., 1], g[..., 0], g[..., 1],
                    os.path.join(save_dir, f"velocity_t{t:03d}.png"))
            else:
                np.savez_compressed(
                    os.path.join(save_dir, f"velocity_t{t:03d}.npz"), u=u)
    vis.frames_to_gif(save_dir, args.what,
                      os.path.join(save_dir, f"{args.what}_anim.gif"))
    print(f"wrote {save_dir}")


if __name__ == "__main__":
    main()
