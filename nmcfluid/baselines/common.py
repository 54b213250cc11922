"""Shared pieces for the baseline methods.

The reference baselines all work on the canonical [-1, 1]^2 domain with the
Taylor-Green field mapped onto it (experiments/INSR-PDE/fluid/*,
experiments/pinnFluid/*): zero normal velocity on the walls enforced by a
1%-of-batch boundary penalty instead of hard BCs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.siren import SirenConfig, apply_siren, init_siren  # noqa: F401


def tg_velocity(x):
    """TG field on [-1,1]^2 (INSR taylorgreen source: rescale to (0, 2pi))."""
    sx = (x[..., 0] + 1.0) * jnp.pi
    sy = (x[..., 1] + 1.0) * jnp.pi
    return jnp.stack([jnp.sin(sx) * jnp.cos(sy),
                      -jnp.cos(sx) * jnp.sin(sy)], axis=-1)


def sample_interior(key, n):
    return jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0)


def sample_boundary(key, n):
    """n points on horizontal walls + n on vertical walls
    (sample_boundary2D_separate)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xh = jnp.stack([jax.random.uniform(k1, (n,), minval=-1, maxval=1),
                    jnp.sign(jax.random.uniform(k2, (n,)) - 0.5)], -1)
    xv = jnp.stack([jnp.sign(jax.random.uniform(k3, (n,)) - 0.5),
                    jax.random.uniform(k4, (n,), minval=-1, maxval=1)], -1)
    return xv, xh   # (vertical walls: x = +-1), (horizontal: y = +-1)


def adam_fit(params, key, loss_fn, lr, max_iters, tol=1.1e-10):
    """while_loop Adam over summed loss dict, like the main trainer."""
    opt = optax.adam(lr)

    def cond(c):
        i, _, _, loss = c
        return (i < max_iters) & (loss > tol)

    def body(c):
        i, p, s, _ = c
        l, g = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(key, i))
        up, s = opt.update(g, s)
        return i + 1, optax.apply_updates(p, up), s, l

    i, params, _, loss = jax.lax.while_loop(
        cond, body, (jnp.int32(0), params, opt.init(params),
                     jnp.float32(jnp.inf)))
    return params, i, loss


def tg_error_curve_grid(n=1000):
    """Evaluation grid + truth for the baselines' tlgn_error convention."""
    ang = np.arange(n) / n * 2.0 * np.pi
    ax, ay = np.meshgrid(ang, ang, indexing="ij")
    truth = np.stack([np.sin(ax) * np.cos(ay), -np.cos(ax) * np.sin(ay)], -1)
    coords = np.stack(np.meshgrid(np.arange(n) / n * 2.0 - 1.0,
                                  np.arange(n) / n * 2.0 - 1.0,
                                  indexing="ij"), -1)
    return jnp.asarray(coords, jnp.float32), truth
