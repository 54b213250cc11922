"""Decompose the per-iteration cost of the phase fits on the TPU.

The 3D frames are fit-dominated (PARITY.md "3D TPU bench captures":
86-99% of the frame is two <=10k-iteration Adam fits at ~0.7-0.8
ms/iter, single-digit-% MXU). This tool times the iteration's
ingredients in isolation — forward eval, value_and_grad, +Adam,
+sampling/target building — each as a fori_loop of `iters` repetitions
on the scene's real shapes, to locate the bound (dispatch / HBM
activation traffic / matmul math) before optimizing.

Usage: python -m nmcfluid.tools_fit_microbench [--scene smoke]
       [--iters 2000] [--n_batch 16384]
Prints one JSON dict of ms/iter per variant.
"""
import argparse
import json
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize sets jax_platforms="axon,cpu" at interpreter
    # start, overriding the env var; re-pin after import (as bench.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from nmcfluid.models.siren import SirenConfig, apply_siren, init_siren
from nmcfluid.models.boundary import apply_boundary
from nmcfluid.scenes import get_scene
from nmcfluid.sim import sampling


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="smoke")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--n_batch", type=int, default=None)
    args = ap.parse_args()

    scene = get_scene(args.scene)
    n = args.n_batch or scene.sample_resolution ** 2
    cfg = SirenConfig(scene.dim, scene.dim,
                      num_hidden_layers=scene.num_hidden_layers,
                      hidden_features=scene.hidden_features,
                      nonlinearity=scene.nonlinearity,
                      normal_init_std=0.1 if scene.dim == 2 else 1.0)
    key = jax.random.PRNGKey(0)
    params = init_siren(key, cfg)
    prev = init_siren(jax.random.fold_in(key, 1), cfg)
    opt = optax.adam(optax.cosine_decay_schedule(scene.lr, 10000,
                                                 alpha=0.01))
    opt_state = opt.init(params)
    x0 = sampling.random_points(key, n, scene.scene_size)
    target0 = jnp.zeros_like(x0)
    eps = jnp.float32(scene.bdry_eps)
    dt = scene.dt
    iters = args.iters

    def vel(p, x):
        return apply_boundary(scene, apply_siren(p, cfg, x), x, eps=eps,
                              t=0, key=jax.random.PRNGKey(7))

    def loss_fn(p, x, target):
        u = vel(p, x)
        return jnp.mean(jnp.sum((u - target) ** 2, axis=-1)) / scene.dim

    def loop(body, init):
        @jax.jit
        def run(init):
            return jax.lax.fori_loop(0, iters, body, init)
        return run

    results = {}

    # 1. raw SIREN forward only (no boundary policy)
    def b_raw(i, c):
        return c + apply_siren(params, cfg, x0 + 1e-9 * c[:, None] * 0)[:, 0]
    results["fwd_raw_net"] = _timed(loop(b_raw, jnp.zeros((n,))),
                                    jnp.zeros((n,)))

    # 2. forward with the boundary policy (one fluid.velocity eval)
    def b_vel(i, c):
        return c + vel(params, x0 + 1e-9 * c[:, None] * 0)[:, 0]
    results["fwd_with_bc"] = _timed(loop(b_vel, jnp.zeros((n,))),
                                    jnp.zeros((n,)))

    # 3. value_and_grad of the loss (fixed batch, no Adam)
    def b_vg(i, c):
        p, s = c
        l, g = jax.value_and_grad(loss_fn)(p, x0, target0)
        return jax.tree.map(lambda a, b: a + 0.0 * b, p, g), s + l
    results["value_and_grad"] = _timed(loop(b_vg, (params, 0.0)),
                                       (params, jnp.float32(0)))

    # 4. + Adam update (fixed batch)
    def b_adam(i, c):
        p, st, s = c
        l, g = jax.value_and_grad(loss_fn)(p, x0, target0)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st, s + l
    results["vg_plus_adam"] = _timed(loop(b_adam, (params, opt_state, 0.0)),
                                     (params, opt_state, jnp.float32(0)))

    # 5. full advect-style iter: sampling + backtrace targets (3 extra
    #    velocity evals of the prev net) + value_and_grad + Adam
    def b_full(i, c):
        p, st, s = c
        kb = jax.random.fold_in(key, i)
        x, valid = sampling.training_points(kb, n, scene,
                                            scene.sample_pattern,
                                            scene.sample_resolution)
        u_prev = vel(prev, x)
        back = x - u_prev * dt
        adv = 2.0 * vel(prev, back) - vel(params, back)
        l, g = jax.value_and_grad(loss_fn)(p, x, adv)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st, s + l
    results["full_advect_iter"] = _timed(
        loop(b_full, (params, opt_state, 0.0)),
        (params, opt_state, jnp.float32(0)))

    # 6. the fused Pallas kernel (sim/fitkernel.py): the whole fit in one
    #    pallas_call, identity affine wrapper, K-batch pool — the per-iter
    #    number to compare against vg_plus_adam / full_advect_iter
    if scene.nonlinearity == "sine" and jax.devices()[0].platform == "tpu":
        from nmcfluid.sim.fitkernel import fused_adam_fit
        K = 8
        kp = jax.random.split(key, K)
        xs = jax.vmap(lambda k: sampling.random_points(
            k, n, scene.scene_size))(kp)
        A = jnp.broadcast_to(jnp.eye(scene.dim), (K, n, scene.dim,
                                                  scene.dim))
        c = jnp.zeros((K, n, scene.dim))
        tgt = jnp.zeros((K, n, scene.dim))
        w = jnp.ones((K, n))
        fit = jax.jit(lambda p: fused_adam_fit(
            p, cfg, (xs, A, c, tgt, w), iters, scene.lr))
        results["fused_kernel_iter"] = _timed(fit, params)

    out = {k: round(1e3 * v / iters, 4) for k, v in results.items()}
    out.update(scene=args.scene, n_batch=n, iters=iters,
               layers=f"{cfg.num_hidden_layers}x{cfg.hidden_features}",
               device=str(jax.devices()[0]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
