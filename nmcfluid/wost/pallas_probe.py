"""Mosaic capability probe for the Pallas walk kernel (round-3 item 1).

The walk inner loop is gather-bound (PARITY.md round-2 notes): per
lane-step it draws a radius via ONE packed gather from the quad-packed
inverse-CDF table (ops/radial_tables.pack_quads) and one bilinear
source-grid lookup. Moving the loop into a Pallas kernel only pays off if
those per-lane dynamic gathers lower correctly through Mosaic — the
round-2 notes flag in-kernel gathers as the design risk, with table-free
importance sampling as the fallback.

This module holds the candidate gather kernels plus a `main()` that
try-compiles each one on the current backend and checks it against the
XLA reference, so the decision is a measurement, not folklore:

    python -m nmcfluid.wost.pallas_probe            # on the TPU
    JAX_PLATFORMS=cpu python -m nmcfluid.wost.pallas_probe --interpret

Variants probed (table rows R = (N_Z-1)*(N_U-1) = 32512, payload 4):
  rows    — out[b] = table[idx[b], :]   via jnp.take(axis=0) in-kernel
  lanes   — out[:, b] = table_t[:, idx[b]] via jnp.take(axis=1) (gather
            along the 128-lane dim, table transposed to (4, R))
  scalar  — fori_loop of scalar dynamic slices (guaranteed-lowerable
            baseline; expected slow, bounds the worst case)
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024  # lanes gathered per kernel instance


def _rows_kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[:].reshape(BLOCK)  # (8, 128) block -> flat lanes
    out_ref[:] = jnp.take(table_ref[:], idx, axis=0,
                          indices_are_sorted=False, unique_indices=False)


def _lanes_kernel(idx_ref, table_t_ref, out_ref):
    # rank-matched gather along the lane dim: indices (P, BLOCK) pick from
    # table_t (P, R) — the tpu dynamic_gather shape contract
    p = table_t_ref.shape[0]
    idx2d = jnp.broadcast_to(idx_ref[:].reshape(BLOCK)[None, :], (p, BLOCK))
    out_ref[:] = jnp.take_along_axis(table_t_ref[:], idx2d, axis=1)


def _scalar_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i // 128, i % 128], :]
        return 0
    jax.lax.fori_loop(0, BLOCK, body, 0)


def _onehot_kernel(idx_ref, table2d_ref, out_ref):
    """Gather-free lookup: one-hot matmul over the 128 padded Z-rows on
    the MXU, then a masked row-sum selects the 4-quad within the row.
    Exact (one-hot matmul moves rows unchanged in f32)."""
    idx = idx_ref[:].reshape(BLOCK)          # flat row index i0*256 + j0
    i0 = idx // 256
    j0 = idx - i0 * 256
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
    onehot = (rows == i0[:, None]).astype(jnp.float32)
    # HIGHEST: the TPU matmul default rounds inputs to bf16, which would
    # round the table values themselves (the one-hot survives either way)
    row = jnp.dot(onehot, table2d_ref[:],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)    # (BLOCK, 1024)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1024), 1)
    cols = [jnp.sum(row * (lane == j0[:, None] * 4 + q), axis=1)
            for q in range(4)]
    out_ref[:] = jnp.stack(cols, axis=1)


def gather_rows(table, idx, variant="rows", interpret=False):
    """(R, P) table, (N,) int32 -> (N, P) via a Pallas gather kernel."""
    n, p = idx.shape[0], table.shape[1]
    assert n % BLOCK == 0
    # (8, 128) index tiles — 1024 lanes per grid step, tiling-legal
    idx = idx.reshape(n // 128, 128)
    idx_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if variant == "lanes":
        kernel, tab = _lanes_kernel, table.T
        out_shape = jax.ShapeDtypeStruct((p, n), table.dtype)
        out_spec = pl.BlockSpec((p, BLOCK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    elif variant == "onehot":
        # semantic layout (127, 256, 4); row index = i0*256 + j0
        assert table.shape == (32512, 4)
        kernel = _onehot_kernel
        tab = jnp.pad(table.reshape(127, 1024), ((0, 1), (0, 0)))
        out_shape = jax.ShapeDtypeStruct((n, p), table.dtype)
        out_spec = pl.BlockSpec((BLOCK, p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        kernel = _rows_kernel if variant == "rows" else _scalar_kernel
        tab = table
        out_shape = jax.ShapeDtypeStruct((n, p), table.dtype)
        out_spec = pl.BlockSpec((BLOCK, p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[idx_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(idx, tab)
    return out.T if variant == "lanes" else out


def _timeit(f):
    jax.block_until_ready(f())   # compile + warm
    t0 = time.time()
    jax.block_until_ready(f())
    return time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="include variants known to CRASH the axon "
                         "worker's remote compiler (HTTP 500 kills the "
                         "TPU worker; next program pays a ~5 min restart)")
    ap.add_argument("--rows", type=int, default=32512)
    ap.add_argument("--n", type=int, default=65536)
    args = ap.parse_args(argv)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (args.rows, 4), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (args.n,),
                             0, args.rows, jnp.int32)
    want = np.asarray(jnp.take(table, idx, axis=0))

    variants = ("xla", "xla_onehot", "onehot")
    if args.all:   # rows/lanes fail to lower; scalar crashes the worker
        variants = ("xla", "xla_onehot", "rows", "lanes", "scalar",
                    "onehot")
    for variant in variants:
        if variant == "xla":   # plain-XLA gather: the bar to beat
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        elif variant == "xla_onehot":
            def f(t, i):       # same one-hot trick, no pallas
                t2 = jnp.pad(t.reshape(127, 1024), ((0, 1), (0, 0)))
                i0 = i // 256
                j0 = i - i0 * 256
                oh = (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], 128),
                                               1) == i0[:, None])
                row = jnp.dot(oh.astype(jnp.float32), t2,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                lane = jax.lax.broadcasted_iota(jnp.int32,
                                                (i.shape[0], 1024), 1)
                return jnp.stack(
                    [jnp.sum(row * (lane == j0[:, None] * 4 + q), axis=1)
                     for q in range(4)], axis=1)
            f = jax.jit(f)
        else:
            f = jax.jit(functools.partial(gather_rows, variant=variant,
                                          interpret=args.interpret))
        try:
            print(f"{variant}: compiling single call...", flush=True)
            out = jax.block_until_ready(f(table, idx))
            ok = np.allclose(np.asarray(out), want)
            print(f"{variant}: ok={ok}, timing marginal cost...",
                  flush=True)

            # marginal per-op cost: repeat K times inside ONE program so
            # the axon tunnel's per-launch latency (~3 ms) drops out —
            # the regime the walk while_loop actually runs in
            def rep(k_steps):
                def body(k, acc):
                    return acc + f(table, (idx + k) % args.rows)[:, 0]
                return jax.jit(lambda: jax.lax.fori_loop(
                    0, k_steps, body, jnp.zeros(args.n)))

            f1, f50 = rep(1), rep(50)
            t1 = min(_timeit(f1) for _ in range(3))
            t50 = min(_timeit(f50) for _ in range(3))
            dt = (t50 - t1) / 49
            print(f"{variant:10s}: {'OK ' if ok else 'WRONG-RESULT'} "
                  f"marginal {dt * 1e3:8.3f} ms/op for {args.n} x4 draws "
                  f"({args.n * 16 / max(dt, 1e-9) / 1e9:.1f} GB/s payload)")
        except Exception as e:  # noqa: BLE001 — probe reports, not raises
            msg = (str(e).splitlines() or [repr(e)])[0][:140]
            print(f"{variant:7s}: FAILS-TO-LOWER {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
