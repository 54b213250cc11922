"""Fused phase-fit kernel: the whole Adam training loop in one Pallas call.

Why this exists: the phase fits ARE the frame (PARITY.md round-3
measurements — 86-100% of every 2D/3D frame), and under XLA they run at
~0.5-0.9 ms/iter for ~10-30 us of matmul math. The limit is not FLOPs:
every iteration of the `lax.while_loop` dispatches ~10^2 small ops whose
(batch, 64/128)-sized intermediates each round-trip HBM. XLA fuses
elementwise chains into their producers but will not fuse ACROSS the
matmul sequence of an MLP forward+backward, so the per-iteration floor
is set by HBM latency x op count. (This is the same conclusion the
round-2 walk-kernel work reached for gathers; here the fix IS
expressible in Mosaic because a phase fit is nothing but small matmuls
and VPU math.)

The fusion rests on a structural fact of this solver (see
sim/fluid.py docstrings): during any one phase fit the training data is
FIXED — advection targets depend only on the frozen prev/tilde params
(model_split.py:87-120), projection targets on the frozen pressure
cloud (model_split.py:245-284), source targets on the scene — and every
scene's hard-BC wrapper is affine in the raw network output,
u(x) = A(x) @ raw(x) + c(x) (models/boundary.py, tested in
test_ls_head.py). So a phase fit is exactly:

    min_params  sum_i w_i | A_i @ MLP(x_i) + c_i - target_i |^2 / norm

over a stream of minibatches — a problem with NO scene code in the hot
loop. We precompute a pool of K minibatches (x, A, c, target, w, norm)
in one big vectorized XLA pass (perfect MXU shapes), then a single
scene-independent Pallas kernel runs all n_iters Adam steps, cycling
batch i % K, with params + Adam moments resident in VMEM and batch
blocks double-buffered from HBM by the Pallas pipeline.

Differences vs the XLA path (`--fit_mode xla`), both gated on the TG
error curve (PARITY.md):
  * minibatches cycle a K-batch pool instead of drawing fresh ones each
    iteration (K=512 x 4096 points ~ 2M-point epoch; the reference's own
    projection fit cycles a fixed 262k cloud, model_split.py:254);
  * the early-stop compare `loss > 1.1e-10` is not evaluated in-kernel —
    the reference's threshold never fires (base.py:148 and SURVEY §4),
    so the fixed-trip-count loop is behaviorally identical.

Layout notes (TPU):
  * Activations are stored transposed, (features, batch_tile): the small
    dimension rides sublanes (padded to 8) and the batch rides lanes, so
    a (K, D, B) pool block wastes nothing, vs (B, D) blocks padding
    D=2..9 up to 128 lanes (a 32x VMEM blowup).
  * dims/targets/affine rows are stacked on the sublane axis; all layer
    loops and micro-tile loops are Python-unrolled (static), so the
    kernel contains no dynamic indexing and no gathers — the two Mosaic
    lowering hazards measured in wost/pallas_probe.py.
  * Matmuls request the same f32-emulation depth as models/siren.py
    (NMCFLUID_MATMUL_PRECISION, default HIGH = 3-pass bf16).
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.siren import OMEGA_0, _PRECISION

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


# Mosaic only lowers DEFAULT and HIGHEST dot precisions, so the
# session's HIGH (3-pass bf16 emulation) has no direct in-kernel
# spelling. Round 3 mapped HIGH -> HIGHEST (6-pass); round-4 A/B on the
# TG shapes measured the pass count at ~28% of the iteration
# (HIGHEST 0.1114 ms/iter vs DEFAULT 0.0799), so the compiled path now
# emulates bf16_3x BY HAND: split each operand into bf16 hi + lo parts
# and issue three DEFAULT-precision (single-pass) dots,
# hi@hi + hi@lo + lo@hi — the same decomposition XLA's HIGH uses, at
# half the passes of HIGHEST. The dropped lo@lo term is O(2^-32)
# relative, below f32 rounding. Interpret mode (the CPU test vehicle)
# keeps HIGHEST = plain f32 dots, preserving the tight exactness
# comparison in tests/test_fitkernel.py; accuracy of the 3-pass path is
# held by test_dot3_matches_f32 plus the TG error gate on hardware.
_KERNEL_PRECISION = (jax.lax.Precision.DEFAULT
                     if _PRECISION == jax.lax.Precision.DEFAULT
                     else jax.lax.Precision.HIGHEST)
_WANT_3PASS = _PRECISION == jax.lax.Precision.HIGH
# Backward dots run single-pass bf16 BY DEFAULT (round 4): gradient
# noise is far above bf16 rounding under Adam's sign-like normalization,
# while the forward keeps the 3-pass emulation (activations feed the
# loss directly). Gated on the TG 50-frame curve: 3.4597e-4 vs 3.4553e-4
# all-HIGH (statistically identical, both under the published 4.142e-4),
# at 0.038 vs 0.0464 ms/iter (error_bem_bwd_r4.txt). Opt out with
# NMCFLUID_FUSED_BWD_PREC=high.
_BWD_DEFAULT = os.environ.get("NMCFLUID_FUSED_BWD_PREC",
                              "default") == "default"


def _dot1(a, b, dims, precision):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _dot3(a, b, dims):
    """bf16_3x emulation: three single-pass MXU dots (see note above)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: _dot1(x, y, dims, jax.lax.Precision.DEFAULT)
    return (d(a_hi, b_lo) + d(a_lo, b_hi)) + d(a_hi, b_hi)


# ---- polynomial sincos ----------------------------------------------
# Round-4 profile of the 3-pass kernel on the TG shapes: the Mosaic
# sin+cos pair costs 53 us of the 95 us iteration (measured by swapping
# in 2-op shims: 0.095 -> 0.0415 ms/iter). A shared Cody-Waite range
# reduction + two odd/even minimax polynomials on [-pi, pi] evaluates
# BOTH functions in ~17 VPU ops/element vs ~28 for the builtin pair.
# Max abs error 9.6e-8 (sin) / 1.1e-8 (cos) on [-pi, pi] — f32 rounding
# level, and the phase error of the two-constant reduction stays
# ~|t| * 2^-30 (SIREN preactivations omega*z sit in |t| < ~10^2, where
# that is < 1e-7). Gated end-to-end on the TG error curve like every
# kernel numeric (PARITY.md round-4).
_SIN_COEF = (0.9999995999016404, -0.16666552631100937,
             0.008332402961144127, -0.0001980863262476326,
             2.6997138290164806e-06, -2.0362212124871227e-08)
_COS_COEF = (0.9999999890437516, -0.4999998910242006,
             0.04166648921512116, -0.00138878035706964,
             2.476988290164933e-05, -2.707902426996817e-07,
             1.7245068100119095e-09)
_INV_2PI = 0.15915493667125702
_PI2_HI = 6.28125            # 2*pi = HI + LO, HI exact in 9 bits
_PI2_LO = 1.9353071795864770e-03


def _sincos_poly(t):
    """sin(t), cos(t) with one shared range reduction (see note above).
    Both are stored by the forward pass so the backward runs
    transcendental-free (the round-3 kernel recomputed sin(omega z) and
    cos(omega z) in backward). Compiled-mode only — interpret mode keeps
    the builtin pair (see _kernel)."""
    k = jnp.round(t * _INV_2PI)
    r = (t - k * _PI2_HI) - k * _PI2_LO          # in [-pi, pi]
    r2 = r * r
    s = _SIN_COEF[-1]
    for a in _SIN_COEF[-2::-1]:
        s = s * r2 + a
    c = _COS_COEF[-1]
    for a in _COS_COEF[-2::-1]:
        c = c * r2 + a
    return r * s, c


def _kernel(cfg, n_iters, K, T,
            # --- inputs (refs) ---
            lr_ref,                                # SMEM (1,1) constant
            x_ref, A_ref, c_ref, tgt_ref, w_ref,   # batch tile (VMEM)
            w_first_in, b_first_in, w_hid_in, b_hid_in, w_out_in, b_out_in,
            # --- outputs (refs) ---
            w_first, b_first, w_hid, b_hid, w_out, b_out, loss_out,
            # --- scratch ---
            hs, cs, m_refs_and_v_refs_and_accs):
    """One grid step = one micro-tile of one Adam iteration.

    Grid is (n_iters, T) with T batch micro-tiles; tile grads accumulate
    in scratch and the Adam update runs on the last tile, so the next
    iteration's forward (a later sequential grid step) sees the new
    params."""
    Lh, D_in, D_out, compiled = cfg
    # compiled (hardware) kernels take the fast numerics: 3-pass bf16
    # dots and the polynomial sincos. Interpret mode — the CPU test
    # vehicle — keeps f32 dots and the builtin sin/cos so the optax
    # oracle comparison stays tight (tests/test_fitkernel.py); the
    # compiled numerics are held by test_dot3_matches_f32 /
    # test_sincos_poly_accuracy and the TG error gate on hardware.
    _dot = _dot3 if (compiled and _WANT_3PASS) else (
        lambda a, b, dims: _dot1(a, b, dims, _KERNEL_PRECISION))
    _dot_b = (lambda a, b, dims: _dot1(a, b, dims,
                                       jax.lax.Precision.DEFAULT)) \
        if (compiled and _BWD_DEFAULT) else _dot
    _sincos = _sincos_poly if compiled else (
        lambda t: (jnp.sin(t), jnp.cos(t)))
    i = pl.program_id(0)
    tile = pl.program_id(1)
    (m_first, v_first, mb_first, vb_first,
     m_hid, v_hid, mb_hid, vb_hid,
     m_out, v_out, mb_out, vb_out,
     gw_first, gb_first, gw_hid, gb_hid, gw_out, gb_out,
     loss_acc, pw) = m_refs_and_v_refs_and_accs

    @pl.when((i == 0) & (tile == 0))
    def _init():
        w_first[:] = w_first_in[:]
        b_first[:] = b_first_in[:]
        w_hid[:] = w_hid_in[:]
        b_hid[:] = b_hid_in[:]
        w_out[:] = w_out_in[:]
        b_out[:] = b_out_in[:]
        for r in (m_first, v_first, mb_first, vb_first, m_hid, v_hid,
                  mb_hid, vb_hid, m_out, v_out, mb_out, vb_out):
            r[:] = jnp.zeros_like(r)
        pw[0] = 1.0   # b1^t accumulator
        pw[1] = 1.0   # b2^t accumulator

    @pl.when(tile == 0)
    def _zero_accs():
        for r in (gw_first, gb_first, gw_hid, gb_hid, gw_out, gb_out):
            r[:] = jnp.zeros_like(r)
        loss_acc[0] = 0.0

    # ---------------- forward (transposed: activations are (feat, Bt))
    x = x_ref[0, :D_in, :]                                   # (D_in, Bt)
    z = _dot(w_first[:], x, ((0,), (0,))) + b_first[:]       # (H, Bt)
    h, co = _sincos(OMEGA_0 * z)
    hs[0] = h
    cs[0] = co
    for l in range(Lh):
        z = _dot(w_hid[l], h, ((0,), (0,))) + b_hid[l]
        h, co = _sincos(OMEGA_0 * z)
        hs[l + 1] = h
        cs[l + 1] = co
    raw = _dot(w_out[:], h, ((0,), (0,))) + b_out[:]         # (D_out, Bt)

    # hard-BC wrapper u = A raw + c, rows of A stacked (d * D_out + e).
    # w already carries the 1/norm of the loss (folded in on the host),
    # so loss = sum w r^2 and dL/du = 2 w r.
    w_row = w_ref[0, 0:1, :]                                 # (1, Bt)
    u_rows = []
    for d in range(D_out):
        acc = c_ref[0, d:d + 1, :]
        for e in range(D_out):
            acc = acc + A_ref[0, d * D_out + e:d * D_out + e + 1, :] \
                * raw[e:e + 1, :]
        u_rows.append(acc)
    g_u = []
    for d in range(D_out):
        r = u_rows[d] - tgt_ref[0, d:d + 1, :]
        loss_acc[0] += jnp.sum(w_row * r * r)
        g_u.append(2.0 * w_row * r)
    # g_raw_e = sum_d A[d,e] g_u_d
    g_raw = jnp.concatenate([
        sum(A_ref[0, d * D_out + e:d * D_out + e + 1, :] * g_u[d]
            for d in range(D_out))
        for e in range(D_out)], axis=0)                      # (D_out, Bt)

    # ---------------- backward
    # head: raw = w_out^T h + b_out
    gw_out[:] += _dot_b(h, g_raw, ((1,), (1,)))              # (H, D_out)
    gb_out[:] += jnp.sum(g_raw, axis=1, keepdims=True)       # (D_out, 1)
    g_h = _dot_b(w_out[:], g_raw, ((1,), (0,)))              # (H, Bt)
    for l in range(Lh - 1, -1, -1):
        g_z = g_h * (OMEGA_0 * cs[l + 1])
        h_in = hs[l]
        gw_hid[l] += _dot_b(h_in, g_z, ((1,), (1,)))
        gb_hid[l] += jnp.sum(g_z, axis=1, keepdims=True)
        g_h = _dot_b(w_hid[l], g_z, ((1,), (0,)))
    g_z = g_h * (OMEGA_0 * cs[0])
    gw_first[:] += _dot_b(x, g_z, ((1,), (1,)))              # (D_in, H)
    gb_first[:] += jnp.sum(g_z, axis=1, keepdims=True)

    # ---------------- Adam update on the last tile
    @pl.when(tile == T - 1)
    def _update():
        pw[0] = pw[0] * ADAM_B1
        pw[1] = pw[1] * ADAM_B2
        bc1 = 1.0 - pw[0]
        bc2 = 1.0 - pw[1]
        lr = lr_ref[0, i]

        def adam(p_ref, g_ref, m_ref, v_ref):
            g = g_ref[:]
            m = ADAM_B1 * m_ref[:] + (1.0 - ADAM_B1) * g
            v = ADAM_B2 * v_ref[:] + (1.0 - ADAM_B2) * (g * g)
            m_ref[:] = m
            v_ref[:] = v
            p_ref[:] = p_ref[:] - lr * (m / bc1) / (
                jnp.sqrt(v / bc2) + ADAM_EPS)

        adam(w_first, gw_first, m_first, v_first)
        adam(b_first, gb_first, mb_first, vb_first)
        adam(w_hid, gw_hid, m_hid, v_hid)
        adam(b_hid, gb_hid, mb_hid, vb_hid)
        adam(w_out, gw_out, m_out, v_out)
        adam(b_out, gb_out, mb_out, vb_out)

        @pl.when(i == n_iters - 1)
        def _final():
            loss_out[0, 0] = loss_acc[0]


# Mosaic's default scoped-VMEM (kernel stack) limit is 16 MB; the
# unrolled forward+backward needs more for production shapes (measured:
# the 6x64 TG net at Bt=2048 allocates 29.9 MB of stack — Mosaic does
# not reuse slots across the unrolled layer temporaries). v5e VMEM is
# 128 MB/core; give the kernel most of it and size tiles to fit.
_VMEM_LIMIT = 100 * 2 ** 20
_STACK_BUDGET = 48 * 2 ** 20


def _pick_tile(B, H, Lh):
    """Largest power-of-two micro-tile whose kernel stack fits the
    budget. Empirical stack model from the Mosaic OOM report: ~16 bytes
    per (layer-ish) * H * point — (Lh+5)*H*Bt*16 was within 1.5x of the
    measured 29.9 MB for (Lh=6, H=64, Bt=2048)."""
    bt = B
    while bt > 512 and (Lh + 5) * H * bt * 16 > _STACK_BUDGET:
        bt //= 2
    env = os.environ.get("NMCFLUID_FUSED_BT")
    if env:
        bt = min(B, int(env))
    while B % bt:
        bt //= 2
    return bt


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "interpret"))
def _fused_call(cfg, n_iters, interpret, pool, lr, params_in):
    Lh, D_in, D_out, H, K, B = cfg
    Bt = _pick_tile(B, H, Lh)
    T = B // Bt
    x, A, c, tgt, w = pool
    w_first, b_first, w_hid, b_hid, w_out, b_out = params_in

    batch_spec = lambda rows: pl.BlockSpec(
        (1, rows, Bt), lambda i, t: (i % K, 0, t),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    # per-iteration learning rate (supports any schedule): the whole
    # (1, n_iters) array sits in SMEM and the kernel indexes column
    # program_id(0) dynamically. Iterations MUST ride the minor axis:
    # Mosaic pads every SMEM row to 512 bytes, so an (n_iters, 1)
    # layout would want n_iters*512 bytes of SMEM (5 MB at 10k iters,
    # vs the 1 MB core limit); (1, n_iters) is one 40 KB row.
    smem_const = pl.BlockSpec(lr.shape, lambda i, t: (0, 0),
                              memory_space=pltpu.SMEM)

    out_shapes = [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params_in]
    out_specs = [const(p.shape) for p in params_in]
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                                  memory_space=pltpu.SMEM))

    scratch = [
        pltpu.VMEM((Lh + 1, H, Bt), jnp.float32),            # hs (sin)
        pltpu.VMEM((Lh + 1, H, Bt), jnp.float32),            # cs (cos)
        # m, v for each param group (first w/b, hid w/b, out w/b)
        pltpu.VMEM(w_first.shape, jnp.float32),
        pltpu.VMEM(w_first.shape, jnp.float32),
        pltpu.VMEM(b_first.shape, jnp.float32),
        pltpu.VMEM(b_first.shape, jnp.float32),
        pltpu.VMEM(w_hid.shape, jnp.float32),
        pltpu.VMEM(w_hid.shape, jnp.float32),
        pltpu.VMEM(b_hid.shape, jnp.float32),
        pltpu.VMEM(b_hid.shape, jnp.float32),
        pltpu.VMEM(w_out.shape, jnp.float32),
        pltpu.VMEM(w_out.shape, jnp.float32),
        pltpu.VMEM(b_out.shape, jnp.float32),
        pltpu.VMEM(b_out.shape, jnp.float32),
        # grad accumulators
        pltpu.VMEM(w_first.shape, jnp.float32),
        pltpu.VMEM(b_first.shape, jnp.float32),
        pltpu.VMEM(w_hid.shape, jnp.float32),
        pltpu.VMEM(b_hid.shape, jnp.float32),
        pltpu.VMEM(w_out.shape, jnp.float32),
        pltpu.VMEM(b_out.shape, jnp.float32),
        pltpu.SMEM((1,), jnp.float32),                       # loss_acc
        pltpu.SMEM((2,), jnp.float32),                       # b1^t, b2^t
    ]

    def kern(lr_ref, x_ref, A_ref, c_ref, tgt_ref, w_ref,
             wf_in, bf_in, wh_in, bh_in, wo_in, bo_in,
             wf, bf, wh, bh, wo, bo, loss_out, hs, cs, *mv):
        _kernel((Lh, D_in, D_out, not interpret), n_iters, K, T,
                lr_ref, x_ref, A_ref, c_ref, tgt_ref, w_ref,
                wf_in, bf_in, wh_in, bh_in, wo_in, bo_in,
                wf, bf, wh, bh, wo, bo, loss_out,
                hs, cs, mv)

    outs = pl.pallas_call(
        kern,
        grid=(n_iters, T),
        in_specs=[smem_const,
                  batch_spec(x.shape[1]), batch_spec(A.shape[1]),
                  batch_spec(c.shape[1]), batch_spec(tgt.shape[1]),
                  batch_spec(w.shape[1]),
                  const(w_first.shape), const(b_first.shape),
                  const(w_hid.shape), const(b_hid.shape),
                  const(w_out.shape), const(b_out.shape)],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(lr, x, A, c, tgt, w,
      w_first, b_first, w_hid, b_hid, w_out, b_out)
    return outs[:6], outs[6][0, 0]


def _want_interpret():
    env = os.environ.get("NMCFLUID_FUSED_INTERPRET")
    if env is not None:
        return env != "0"
    return jax.default_backend() in ("cpu",)


def fused_adam_fit(params, cfg, pool_xactw, n_iters, lr):
    """Run `n_iters` Adam steps on SIREN `params` over a K-batch pool.

    params: list of (W, b) as in models.siren (sine nonlinearity only).
    pool_xactw: (x, A, c, target, w) with x (K, B, D_in), A (K, B, D, D),
        c/target (K, B, D), w (K, B) — the standard (batch, feature)
        layout; this wrapper transposes to the kernel's lane layout.
    lr: scalar, or an (n_iters,) array of per-iteration learning rates
        (any schedule).
    Returns (params, final_loss) with the same pytree structure.
    """
    x, A, c, tgt, w = pool_xactw
    K, B, D_in = x.shape
    D_out = c.shape[-1]
    H = params[0][0].shape[1]
    Lh = len(params) - 2                     # stacked (H, H) hidden layers
    # kernel layout: (K, rows, B); affine rows d * D_out + e
    xT = jnp.transpose(x, (0, 2, 1))
    AT = jnp.transpose(A.reshape(K, B, D_out * D_out), (0, 2, 1))
    cT = jnp.transpose(c, (0, 2, 1))
    tT = jnp.transpose(tgt, (0, 2, 1))
    # fold the loss normalization into the weights: loss = sum w' r^2
    norm = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0) * D_out
    wT = (w / norm)[:, None, :]
    w_first, b_first = params[0]
    w_hid = jnp.stack([params[1 + l][0] for l in range(Lh)]) \
        if Lh else jnp.zeros((0, H, H), jnp.float32)
    b_hid = jnp.stack([params[1 + l][1][:, None] for l in range(Lh)]) \
        if Lh else jnp.zeros((0, H, 1), jnp.float32)
    w_out, b_out = params[-1]
    params_in = (w_first, b_first[:, None], w_hid, b_hid,
                 w_out, b_out[:, None])
    lr_arr = jnp.broadcast_to(
        jnp.asarray(lr, jnp.float32).reshape(1, -1), (1, n_iters))
    outs, loss = _fused_call(
        (Lh, D_in, D_out, H, K, B), n_iters, _want_interpret(),
        (xT, AT, cT, tT, wT), lr_arr, params_in)
    wf, bf, wh, bh, wo, bo = outs
    new = [(wf, bf[:, 0])]
    for l in range(Lh):
        new.append((wh[l], bh[l, :, 0]))
    new.append((wo, bo[:, 0]))
    return new, loss


def reference_adam_fit(params, cfg, pool_xactw, n_iters, lr):
    """Pure-JAX mirror of fused_adam_fit (same pool-cycling semantics,
    same optax-style Adam) — the exactness oracle for the kernel."""
    import optax
    from ..models.siren import apply_siren

    x, A, c, tgt, w = pool_xactw
    K = x.shape[0]
    D_out = c.shape[-1]
    lr_arr = jnp.broadcast_to(
        jnp.asarray(lr, jnp.float32).reshape(-1), (n_iters,))
    opt = optax.adam(lambda count: lr_arr[jnp.minimum(count, n_iters - 1)])

    def loss_fn(p, j):
        raw = apply_siren(p, cfg, x[j])
        u = jnp.einsum('nde,ne->nd', A[j], raw) + c[j]
        se = jnp.sum((u - tgt[j]) ** 2, axis=-1)
        return jnp.sum(w[j] * se) / (
            jnp.maximum(jnp.sum(w[j]), 1.0) * D_out)

    def body(i, carry):
        p, s, _ = carry
        loss, g = jax.value_and_grad(loss_fn)(p, i % K)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, loss

    p, _, loss = jax.lax.fori_loop(
        0, n_iters, body, (params, opt.init(params), jnp.float32(0.0)))
    return p, loss
