"""Baseline comparison harness: reproduce the published TG error table.

`python -m nmcfluid.baselines.run {insr,pinn,pideeponet} [--frames 50]`
writes TWO curves per method:
  * error_<method>.txt — per-frame mean |u - u_TG|^2 with velocity and
    truth evaluated on the SAME 1000^2 grid (the honest metric);
  * error_<method>_refpipe.txt — the same velocity scored through the
    reference's published evaluation pipeline, which samples velocity at
    cell centers but truth at vertices (a half-texel misalignment; see
    common.ref_pipeline_error). The published final_material numbers sit
    on that pipeline's exact-field floor — pinn 3.951e-3 / pideeponet
    3.945e-3 vs floor 3.943e-3 (N=50), INSR 1.024e-3 vs floor 8.0e-4
    (N=100) — so parity with the published curves is checked against the
    _refpipe file, and method quality against the honest one.
"""
import argparse
import glob
import os
import re
import time

import jax
import numpy as np

from .common import centers_grid, ref_pipeline_error, tg_error_curve_grid
from .insr import INSRFluid
from .pinn import PINNFluid
from .pideeponet import PIDeepONetFluid
from ..utils.checkpoint import load_ckpt, save_ckpt


def latest_insr_ckpt(ck_dir):
    """Highest-step `ckpt_step_tNNN.npz` in ck_dir, or None."""
    steps = [int(m.group(1)) for p in glob.glob(
        os.path.join(ck_dir, "ckpt_step_t*.npz"))
        if (m := re.search(r"ckpt_step_t(\d+)\.npz$", p))]
    return max(steps) if steps else None


def error_of(vel_fn, coords, truth, chunk=200_000):
    flat = np.asarray(coords).reshape(-1, 2)
    outs = []
    for i in range(0, flat.shape[0], chunk):
        outs.append(np.asarray(vel_fn(flat[i:i + chunk])))
    u = np.concatenate(outs).reshape(truth.shape)
    return float(np.mean(np.sum((u - truth) ** 2, axis=-1)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("method", choices=["insr", "pinn", "pideeponet"])
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--dt", type=float, default=0.001)
    ap.add_argument("--max_n_iters", type=int, default=None)
    ap.add_argument("--sample_resolution", type=int, default=128)
    ap.add_argument("--grid", type=int, default=1000)
    ap.add_argument("--out", default="results/baselines")
    ap.add_argument("--resume", action="store_true",
                    help="INSR only: continue from the latest per-frame "
                         "checkpoint in <out>/ckpt_insr (frames are "
                         "sequential network state, so a cut run would "
                         "otherwise restart from frame 0)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    coords, truth = tg_error_curve_grid(args.grid)
    # reference-pipeline grids: save_vel.py N=50 (pinn/deeponet),
    # INSR write_output N=100 (fluid/model.py:209)
    n_ref = 100 if args.method == "insr" else 50
    coords_ref = centers_grid(n_ref)
    errors, errors_ref = [], []
    key = jax.random.PRNGKey(0)

    path = os.path.join(args.out, f"error_{args.method}.txt")
    path_ref = os.path.join(args.out, f"error_{args.method}_refpipe.txt")

    def record(vel_fn, t0=None):
        e = error_of(vel_fn, coords, truth)
        vel_ref = np.asarray(vel_fn(coords_ref.reshape(-1, 2))) \
            .reshape(n_ref, n_ref, 2)
        er = ref_pipeline_error(vel_ref, args.method)
        errors.append(e)
        errors_ref.append(er)
        np.savetxt(path, errors)       # incremental (frames are minutes)
        np.savetxt(path_ref, errors_ref)
        dt_s = f" ({time.time() - t0:.1f}s)" if t0 else ""
        print(f"frame {len(errors)}: err={e:.6e} refpipe={er:.6e}{dt_s}",
              flush=True)

    if args.method == "insr":
        m = INSRFluid(dt=args.dt,
                      max_n_iters=args.max_n_iters or 20_000,
                      sample_resolution=args.sample_resolution)
        ck_dir = os.path.join(args.out, "ckpt_insr")
        st = m.init()
        start = 0
        last = latest_insr_ckpt(ck_dir) if args.resume else None
        if last is not None:
            st, start = load_ckpt(ck_dir, st, last)
            # reload the incremental curves up to the resume point; the
            # per-frame RNG is fold_in(key, f+1) (stateless), so the
            # continued run is identical to an uncut one
            errors.extend(np.atleast_1d(np.loadtxt(path))[:start])
            errors_ref.extend(np.atleast_1d(np.loadtxt(path_ref))[:start])
            print(f"resumed from checkpoint t{last} "
                  f"({len(errors)} recorded frames)", flush=True)
        else:
            st["vel"], i, l = m.fit_source(st["vel"], key)[0:3]
            save_ckpt(ck_dir, st, 0)
        for f in range(start, args.frames):
            t0 = time.time()
            st = m.step(st, jax.random.fold_in(key, f + 1))
            record(lambda x: m._vel(st["vel"], x), t0)
            # after record: a cut between the two re-runs this frame on
            # resume instead of leaving a hole in the curve
            save_ckpt(ck_dir, st, f + 1)
    else:
        # t_range stays the reference's 2.5 (config.py:143) even though
        # the error curve evaluates only t in [0, frames * dt] = [0, 0.05]
        # — the published numbers carry that train/eval mismatch.
        if args.method == "pinn":
            m = PINNFluid(max_n_iters=args.max_n_iters or 50_000,
                          sample_resolution=args.sample_resolution)
        else:
            m = PIDeepONetFluid(max_n_iters=args.max_n_iters or 50_000,
                                sample_resolution=args.sample_resolution)
        st = m.init()
        t0 = time.time()
        st, i, l = m.train(st, key)
        print(f"trained {int(i)} iters, loss {float(l):.3e} "
              f"({time.time() - t0:.1f}s)", flush=True)
        for f in range(args.frames):
            t = (f + 1) * args.dt
            record(lambda x: m.velocity(st, x, t))

    print(f"mean error {np.mean(errors):.6e} -> {path}")
    print(f"mean refpipe error {np.mean(errors_ref):.6e} -> {path_ref}")


if __name__ == "__main__":
    main()
