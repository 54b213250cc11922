"""Walk-stage roofline decomposition on real hardware (round-5 verdict #1).

The walk is ~95% of every parity frame (bench_detail: TG 11.4 s of
12.0 s/frame). This tool measures, on the device it runs on:

  1. the production pool trip decomposed: one `_advance` step over the
     full slot array (with and without the source-grid term), the
     scatter/refill stage, and the S-wide start-state generation;
  2. micro-costs of the advance step's components at pool width:
     ray_intersect, star_radius, the Yukawa greens bundle, the
     counter-based RNG draws, and the div-grid source gather;
  3. empirical machine ceilings measured the same way: HBM triad
     bandwidth, VPU fp32 FMA throughput, and per-lane gather rate into
     a 4 MB table;
  4. the end-to-end production chunk (estimate_solution_and_gradient_pool
     on a 65536-point TG cloud at parity settings) with derived
     totals: outer trips, lane-step rate, useful walk-step rate.

Output: one JSON dump (docs/walk_roofline_r5.json by default) with the
achieved bytes/s / flops/s of the advance step against the measured
ceilings — the evidence base for the round-5 kernel attack (or its
negative). Reference hot loop: walk_on_stars.h:135-329.

Run:  python -m nmcfluid.tools_walk_roofline [--out PATH] [--quick]
"""
import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from .scenes import get_scene
from .sim import sampling
from .sim.fluid import NeuralFluid
from .ops import fastrand
from .wost import pool as wp
from .wost.solver import _advance, _fresh_state


def timeit(fn, *args, n=8, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def loop_time(step, x0, iters, n=5, warm=1):
    """Per-iteration seconds of `step` (pytree -> same pytree) amortized
    over `iters` sequential trips of ONE device program.

    The axon tunnel adds ~40-50 ms latency to every dispatch (measured:
    a 256 KB no-op and a 768 MB triad both return in ~45 ms), so
    standalone per-op timing at this scale is pure noise; chaining the
    op through a fori_loop carry amortizes the round-trip to <1%.
    `step` must thread its output back into its input (data dependence
    defeats loop-invariant hoisting)."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), x)

    for _ in range(warm):
        jax.block_until_ready(run(x0))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def machine_ceilings(quick=False):
    """Empirical HBM / VPU / gather ceilings on this device, each
    loop-amortized inside one program (see loop_time)."""
    out = {}
    # HBM triad: b <- a * 1.0001 + b, 2 reads + 1 write per iter
    n = (1 << 24) if quick else (1 << 26)
    a = jnp.arange(n, dtype=jnp.float32)
    b = jnp.ones((n,), jnp.float32)
    t = loop_time(lambda c: (c[0], c[0] * 1.0001 + c[1]), (a, b), 64)
    out["hbm_triad_GBs"] = 3 * 4 * n / t / 1e9
    # VPU fp32 fma chain on a VMEM-resident block
    m = (8, 128, 2048)   # 8 MB
    x = jnp.ones(m, jnp.float32)
    t = loop_time(lambda x: x * 1.000001 + 1e-7, x, 2048)
    out["vpu_fma_GFLOPs"] = 2 * np.prod(m) / t / 1e9
    # per-lane gather into a 4 MB table (the div-grid access pattern);
    # the gathered value feeds the next round's indices
    S = 1 << 19
    T = 1 << 20
    tbl = jnp.ones((T,), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, T, size=S),
                      jnp.int32)

    def g(idx):
        v = jnp.take(tbl, idx)
        return (idx + v.astype(jnp.int32) + 7919) & (T - 1)
    t = loop_time(g, idx, 64)
    out["gather_Mlanes_s"] = S / t / 1e6
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/walk_roofline_r5.json")
    ap.add_argument("--scene", default="taylorgreen")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip_e2e", action="store_true")
    ap.add_argument("--wost_source", default="grid",
                    choices=["grid", "net"])
    ap.add_argument("--skip_micro", action="store_true")
    args = ap.parse_args()

    dev = str(jax.devices()[0])
    print(f"device: {dev}")
    res = {"device": dev, "scene": args.scene}

    scene = get_scene(args.scene)
    fluid = NeuralFluid(scene, wost_source=args.wost_source)
    ws = fluid.walk_settings
    D = scene.dim

    N = fluid.wost_chunk
    S = min(8 * N, 1 << 20)
    n_anti = 2
    n_pairs = max(1, ws.n_walks // 2)
    W = n_pairs * n_anti * N
    key = jax.random.PRNGKey(0)
    pts, _ = sampling.fluid_points(key, N, scene)
    if args.wost_source == "net":
        wscene = fluid._wost_scene_net
        params0 = fluid.init_state(0).params
        src_args = (params0, jnp.float32(scene.bdry_eps), jnp.int32(0))
    else:
        wscene = fluid._wost_scene
        src_args = (0.1 * jnp.ones(
            tuple([fluid.div_resolution] * D), jnp.float32),)
    res["wost_source"] = args.wost_source
    greens = wscene.greens()
    div_grid = src_args   # legacy name: the dynamic source args tuple

    res["config"] = {
        "N_points": N, "S_slots": S, "n_pairs": n_pairs,
        "W_queued_walks": W, "K_refill": ws.pool_refill_every,
        "segments_P": int(wscene.neumann.a.shape[0])
        if hasattr(wscene.neumann, "a") else None,
        "div_grid_MB": (round(div_grid[0].size * 4 / 1e6, 2)
                        if args.wost_source == "grid" else None),
    }
    print("config:", res["config"])

    # ---- pool state at production width
    pd = jax.jit(wp._precompute, static_argnums=(0, 1))(
        wscene, ws, pts, key)
    seed2 = fastrand.seed_from_key(jax.random.fold_in(key, 2))
    seed_w = fastrand.seed_from_key(jax.random.fold_in(key, 1))
    g_ids = jnp.arange(S, dtype=jnp.int32)

    def start(g):
        return wp._start_states(wscene, ws, pd, seed2, g, div_grid,
                                n_pairs, n_anti, N, None)

    st0, ok0, fs0, bv0, sv0 = jax.jit(start)(g_ids)

    def start_step(c):
        g, s = c
        st, ok, fs, bv, sv = start(g)
        s = s + jnp.sum(st.x[:, 0]) * 1e-20
        return (g + s.astype(jnp.int32) % 3, s)   # data-dep reissue
    t_start = loop_time(start_step, (g_ids, jnp.float32(0)), 16)
    res["start_states_S_ms"] = round(t_start * 1e3, 3)

    w_, _, i_, _ = wp._decode(g_ids, n_anti, N, None)
    pl0 = (w_ * N + i_).astype(jnp.uint32)

    def adv_step(settings):
        def f(st):
            return _advance(wscene, greens, settings, st,
                            wp._make_draw(seed_w, st, pl0), div_grid,
                            step_cap=settings.pool_step_cap)
        return f

    t_adv = loop_time(adv_step(ws), st0, 32)
    res["advance1_S_ms"] = round(t_adv * 1e3, 3)
    ws_nosrc = dataclasses.replace(ws, ignore_source=True)
    t_adv_nosrc = loop_time(adv_step(ws_nosrc), st0, 32)
    res["advance1_nosource_S_ms"] = round(t_adv_nosrc * 1e3, 3)

    K = max(1, ws.pool_refill_every)

    # ---- scatter/refill at production width (g_hi = W: lanes reissue)
    carry0 = wp.PoolCarry(
        next_lane=jnp.int32(S), st=st0, g=g_ids, ok=ok0, first_src=fs0,
        bgd_vec=bv0, sgd_vec=sv0,
        acc=jnp.zeros((N, 4 + 2 * D), jnp.float32))
    cv = jnp.zeros((N, 2), jnp.float32)

    def refill_step(carry):
        return wp._scatter_refill(wscene, ws, pd, seed2, jnp.int32(W), cv,
                                  carry, div_grid, n_pairs, n_anti,
                                  N, None)
    st1 = jax.jit(adv_step(ws))(st0)
    carry1 = carry0._replace(st=st1)
    t_refill = loop_time(refill_step, carry1, 16)
    res["scatter_refill_S_ms"] = round(t_refill * 1e3, 3)
    term_frac = float(jnp.mean((st1.status != wp.ACTIVE)
                               & (st1.status != wp.EMPTY)))
    res["terminated_after_1_step_frac"] = round(term_frac, 4)

    # the production outer trip, composed exactly as _pool_launch.body
    def trip_step(carry):
        c = refill_step(carry)
        st = c.st
        w2, _, i2, _ = wp._decode(c.g, n_anti, N, None)
        pl = (w2 * N + i2).astype(jnp.uint32)
        for _ in range(K):
            st = _advance(wscene, greens, ws, st,
                          wp._make_draw(seed_w, st, pl), div_grid,
                          step_cap=ws.pool_step_cap)
        return c._replace(st=st)
    t_trip = loop_time(trip_step, carry1, 16)
    res["outer_trip_ms"] = round(t_trip * 1e3, 3)
    res["outer_trip_split_est"] = {
        "refill_pct": round(100 * t_refill / t_trip, 1),
        "advance_pct": round(100 * K * t_adv / t_trip, 1),
    }

    # ---- component micro-costs at pool width, loop-amortized with the
    # output folded back into the input (defeats hoisting)
    q = wscene.qmod()
    soup = wscene.neumann
    x = st0.x
    micro = {}

    def ray_step(x):
        hit, t, pt, n = q.ray_intersect(
            soup, x, jnp.full_like(x, 0.7071), jnp.ones(x.shape[:-1]))
        return x + 1e-12 * pt
    micro["ray_intersect_ms"] = round(loop_time(ray_step, x, 64) * 1e3, 3)

    def star_step(x):
        r = q.star_radius(soup, x, ws.min_star_radius,
                          jnp.full(x.shape[:-1], 10.0))
        return x + 1e-12 * r[..., None]
    micro["star_radius_ms"] = round(loop_time(star_step, x, 64) * 1e3, 3)

    def dd_step(x):
        return x + 1e-12 * q.dist_to_far_bbox_corner(soup, x)[..., None]
    micro["dirichlet_dist_ms"] = round(loop_time(dd_step, x, 64) * 1e3, 3)

    R0 = jnp.full((S,), 0.5, jnp.float32)
    u2 = jnp.stack([jnp.full((S,), 0.3), jnp.full((S,), 0.7)], -1)

    def greens_step(R):
        ball = greens.make_ball(R)
        r, ev = greens.sample_radius_u(ball, u2)
        out = greens.dspk(ball, r) + greens.norm(ball) + ev
        return R + 1e-12 * out
    micro["greens_bundle_ms"] = round(
        loop_time(greens_step, R0, 64) * 1e3, 3)

    lanes = fastrand.lane_iota((S,))

    def rng_step(c):
        seed, s = c
        for salt in range(6):
            s = s + fastrand.uniform(seed, 3, salt, lanes)
        return (seed + s[0].astype(jnp.uint32) % 3, s)
    micro["rng6_ms"] = round(
        loop_time(rng_step, (seed_w, jnp.zeros((S,), jnp.float32)),
                  64) * 1e3, 3)

    def src_step(y):
        v = wscene.source_fn(y, *div_grid)
        return y + 1e-12 * v[..., None]
    micro["source_gather_ms"] = round(loop_time(src_step, x, 64) * 1e3, 3)
    res["micro_S_wide"] = micro

    # ---- analytical traffic/flops of one advance step (hand count)
    P = res["config"]["segments_P"] or 0
    state_B = (2 * D + 7) * 4          # WalkState fields r+w, ~bytes/lane
    flops_geom = P * 30 + P * 25       # ray + closest/star, ~per lane
    flops_greens = 400                 # bessel polys + table matmul row
    flops_misc = 150
    res["analytic_per_lane_step"] = {
        "state_bytes_rw": 2 * state_B,
        "flops_est": flops_geom + flops_greens + flops_misc,
    }
    lane_rate = S / t_adv
    res["achieved"] = {
        "advance_lane_steps_per_s_M": round(lane_rate / 1e6, 1),
        "advance_state_GBs": round(lane_rate * 2 * state_B / 1e9, 1),
        "advance_GFLOPs_est": round(
            lane_rate * (flops_geom + flops_greens + flops_misc) / 1e9, 1),
        "trip_lane_steps_per_s_M": round(K * S / t_trip / 1e6, 1),
    }

    res["ceilings"] = machine_ceilings(args.quick)

    # ---- end-to-end production chunk
    if not args.skip_e2e:
        from .wost.pool import estimate_solution_and_gradient_pool as e2e

        def run_chunk():
            return e2e(wscene, ws, pts, key, source_args=div_grid)
        t_e2e = timeit(run_chunk, n=3 if args.quick else 5, warm=1)
        res["e2e_chunk_s"] = round(t_e2e, 3)
        trips = int(np.ceil(W / S))
        res["e2e_derived"] = {
            "outer_trips_min": trips,
            "implied_ms_per_trip": round(t_e2e / trips * 1e3, 2),
            "decomposed_ms_per_trip": round(t_trip * 1e3, 2),
            "useful_walk_steps_per_s_M": round(
                W * 1.1 / t_e2e / 1e6, 1),   # mean walk len ~1.1 at sig=350
        }

    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
