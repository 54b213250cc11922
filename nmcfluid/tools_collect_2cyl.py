"""Collect the karman2cyl 100-frame e2e artifacts (round-5 verdict #2).

Copies vorticity frames from the wost and bem runs, and computes the
cross-solver gap: per-frame kinetic-energy curves plus the early-frame
velocity-field L2 gap (before chaotic divergence makes pointwise
comparison meaningless) evaluated from the saved checkpoints.

Usage: python -m nmcfluid.tools_collect_2cyl \
           --wost /tmp/r5_2cyl_wost/karman2cyl \
           --bem /tmp/r5_2cyl_bem/karman2cyl --out docs/karman2cyl_r5
"""
import argparse
import json
import os
import shutil

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wost", required=True)
    ap.add_argument("--bem", required=True)
    ap.add_argument("--out", default="docs/karman2cyl_r5")
    ap.add_argument("--frames", default="10,50,100")
    ap.add_argument("--gap_frames", type=int, default=20)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for tag, d in (("wost", args.wost), ("bem", args.bem)):
        for t in args.frames.split(","):
            src = os.path.join(d, "vorticity", f"vorticity_t{int(t):03d}.png")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.out,
                                              f"vorticity_{tag}_t{int(t):03d}.png"))
        e = os.path.join(d, "energy.txt")
        if os.path.exists(e):
            shutil.copy(e, os.path.join(args.out, f"energy_{tag}.txt"))

    # velocity-field L2 gap on early frames, from checkpoints
    import jax
    import jax.numpy as jnp
    from nmcfluid.scenes import get_scene
    from nmcfluid.sim import NeuralFluid, sampling
    from nmcfluid.utils import load_ckpt

    scene = get_scene("karman2cyl")
    fl = NeuralFluid(scene)
    like = fl.init_state(0).params
    eps = scene.bdry_eps / 2.0          # run.py halves after add_source
    pts = sampling.uniform_grid(scene.scene_size, 128).reshape(-1, 2)
    mask = np.asarray(scene.fluid_mask(pts))
    gaps = []
    for t in range(1, args.gap_frames + 1):
        try:
            pw, _ = load_ckpt(os.path.join(args.wost, "model"), like, t)
            pb, _ = load_ckpt(os.path.join(args.bem, "model"), like, t)
        except Exception:
            break
        uw = np.asarray(fl.velocity(pw, jnp.asarray(pts), eps=eps))
        ub = np.asarray(fl.velocity(pb, jnp.asarray(pts), eps=eps))
        num = np.sqrt(np.mean(np.sum((uw - ub) ** 2, -1)[mask]))
        den = np.sqrt(np.mean(np.sum(uw ** 2, -1)[mask])) + 1e-12
        gaps.append(float(num / den))

    # 2D runs write no energy.txt (that is the 3d/main.py surface);
    # compute 0.5 mean |u|^2 on the fluid mask from the checkpoints
    def ke_curve(run_dir):
        out = []
        for t in range(1, 101):
            try:
                p, _ = load_ckpt(os.path.join(run_dir, "model"), like, t)
            except Exception:
                break
            u = np.asarray(fl.velocity(p, jnp.asarray(pts), eps=eps))
            out.append(0.5 * float(np.mean(np.sum(u ** 2, -1)[mask])))
        return np.asarray(out) if out else None

    ew = ke_curve(args.wost)
    eb = ke_curve(args.bem)
    if ew is not None:
        np.savetxt(os.path.join(args.out, "energy_wost.txt"), ew)
    if eb is not None:
        np.savetxt(os.path.join(args.out, "energy_bem.txt"), eb)
    rep = {
        "frames_compared": len(gaps),
        "rel_velocity_gap_per_frame": [round(g, 5) for g in gaps],
        "energy_final": {
            "wost": float(ew[-1]) if ew is not None else None,
            "bem": float(eb[-1]) if eb is not None else None,
        },
        "energy_rel_gap_final": (
            float(abs(ew[-1] - eb[-1]) / (abs(ew[-1]) + 1e-12))
            if ew is not None and eb is not None
            and len(ew) == len(eb) else None),
    }
    with open(os.path.join(args.out, "cross_solver_gap.json"), "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
