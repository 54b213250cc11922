"""Boundary value caching (BVC): splatted re-use of boundary estimates.

Rebuild of zombie's secondary estimator
(bindings/zombie/include/zombie/boundary_value_caching/{boundary_sampler,
splatter}.h, exposed as `bvc` in demo.cpp:265-363 but never called by the
fluid loop — SURVEY.md N11): estimate the solution once at a cache of
boundary samples with WoSt, then evaluate anywhere by splatting through
free-space Green's kernels,
    u(x) = - a(x) . sum_b P(x, y_b) u(y_b) / (N pdf_b)        [dp/dn = 0]
           + sum_s G(x, y_s) f(y_s) / (N pdf_s),
the boundary-integral identity for the screened Poisson problem with zero
Neumann data. Kernel regularization follows splatter.h:12-41 (2D Poisson
kernel x (1 - e^{-r^2}); 3D Green x erf(r), etc.).

Evaluation is one dense (eval x cache) kernel contraction — on TPU this is
a single fused broadcast-reduce instead of zombie's per-eval-point TBB
loop over the cache.
"""
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bessel
from .solver import WalkSettings, WostScene, estimate_solution  # noqa: F401 (re-export)


# ------------------------------------------------- free-space Green kernels

def _free_G(dim, lam, r):
    if dim == 2:
        if lam > 0.0:
            z = math.sqrt(lam) * r
            return bessel.k0e(z) * jnp.exp(-z) / (2.0 * jnp.pi)
        return -jnp.log(r) / (2.0 * jnp.pi)
    if lam > 0.0:
        z = math.sqrt(lam) * r
        return jnp.exp(-z) / (4.0 * jnp.pi * r)
    return 1.0 / (4.0 * jnp.pi * r)


def _free_dGdr(dim, lam, r):
    if dim == 2:
        if lam > 0.0:
            s = math.sqrt(lam)
            z = s * r
            return -s * bessel.k1e(z) * jnp.exp(-z) / (2.0 * jnp.pi)
        return -1.0 / (2.0 * jnp.pi * r)
    if lam > 0.0:
        z = math.sqrt(lam) * r
        return -jnp.exp(-z) * (1.0 + z) / (4.0 * jnp.pi * r ** 2)
    return -1.0 / (4.0 * jnp.pi * r ** 2)


def _regularize_P(dim, r_hat):
    """splatter.h:30-41."""
    if dim == 2:
        return 1.0 - jnp.exp(-r_hat ** 2)
    return jax.scipy.special.erf(r_hat) \
        - 2.0 * r_hat * jnp.exp(-r_hat ** 2) / math.sqrt(math.pi)


def _regularize_G(dim, r_hat):
    """splatter.h:12-27."""
    if dim == 2:
        return jnp.ones_like(r_hat)
    return jax.scipy.special.erf(r_hat)


# -------------------------------------------------------- boundary sampling

class BoundaryCache(NamedTuple):
    pts: jax.Array       # (B, D) cache positions (on the boundary)
    normals: jax.Array   # (B, D) outward (out-of-fluid) normals
    pdf: jax.Array       # (B,) sampling density w.r.t. boundary measure
    solution: jax.Array  # (B,) WoSt estimates of u at the cache


def sample_boundary_uniform(soup, n, key):
    """Uniform-by-length boundary samples on a Seg2D soup -> (pts, normals,
    pdf). (boundary_sampler.h uniform area sampling.)"""
    a, b, nrm = soup.a, soup.b, soup.n
    ln = jnp.linalg.norm(b - a, axis=-1)
    ln = jnp.where(ln < 1.0, ln, 0.0)          # padded slots are FAR apart
    total = jnp.sum(ln)
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, jnp.log(jnp.maximum(ln, 1e-30)), shape=(n,))
    u = jax.random.uniform(k2, (n, 1))
    pts = a[idx] + u * (b[idx] - a[idx])
    pdf = jnp.full((n,), 1.0, jnp.float32) / total
    return pts, nrm[idx], pdf


def build_cache(scene: WostScene, settings: WalkSettings, soup, n_cache,
                key, n_walks=None, offset=None):
    """WoSt-estimate the solution at boundary samples (offset one epsilon
    shell into the fluid — the reference estimates the boundary limit with
    alpha = 2; the inward offset is the bias-free equivalent for the
    lockstep solver)."""
    k1, k2 = jax.random.split(key)
    pts, normals, pdf = sample_boundary_uniform(soup, n_cache, k1)
    off = offset if offset is not None else 2.0 * settings.epsilon_shell
    inner = pts - off * normals
    sol, n_valid, _ = estimate_solution(scene, settings, inner, k2, n_walks)
    return BoundaryCache(pts=pts, normals=normals, pdf=pdf, solution=sol)


# --------------------------------------------------------------- evaluation

@partial(jax.jit, static_argnums=(0, 5, 6, 7))
def evaluate(scene: WostScene, cache: BoundaryCache, eval_pts, src_pts,
             src_pdf, n_src_total: int, radius_clamp: float = 0.0,
             kernel_regularization: float = 0.0, source_args=()):
    """Splat the cache (+ a Monte Carlo source sum over src_pts with
    density src_pdf) to eval_pts. Returns u(eval_pts).

    alpha = 2 for evaluation points on the boundary is the caller's
    business; interior points (the fluid's use) use alpha = 1
    (splatter.h:238-241)."""
    dim = scene.dim
    lam = float(scene.absorption)

    d = eval_pts[:, None, :] - cache.pts[None, :, :]      # (E, B, D)
    r = jnp.linalg.norm(d, axis=-1)
    r = jnp.maximum(r, radius_clamp)
    dGdr = _free_dGdr(dim, lam, jnp.maximum(r, 1e-12))
    cosang = jnp.sum(d * cache.normals[None], axis=-1) / jnp.maximum(r, 1e-12)
    # P(x, y) = dG/dr * d(r)/dn_y = dG/dr * ((y - x) . n)/r = -dGdr*cos
    P = -dGdr * cosang
    if kernel_regularization > 0.0:
        P = P * _regularize_P(dim, r / kernel_regularization)
    w = 1.0 / (cache.pdf[None] * cache.pts.shape[0])
    u_b = -jnp.sum(P * cache.solution[None] * w, axis=1)

    if src_pts is not None:
        ds = jnp.linalg.norm(eval_pts[:, None, :] - src_pts[None], axis=-1)
        ds = jnp.maximum(jnp.maximum(ds, radius_clamp), 1e-12)
        G = _free_G(dim, lam, ds)
        if kernel_regularization > 0.0:
            G = G * _regularize_G(dim, ds / kernel_regularization)
        f = scene.source_fn(src_pts, *source_args)
        u_s = jnp.sum(G * f[None] / (src_pdf[None] * n_src_total), axis=1)
    else:
        u_s = 0.0
    return u_b + u_s
