"""Cheap counter-based lane RNG for the walk kernel.

jax.random's threefry costs ~100+ ALU ops per 32-bit draw (plus a fold_in
hash per step); with 3-4 draws per lane-step it dominates the walk loop's
per-step cost. This module provides a PCG-style double hash (~10 ops per
draw) keyed on (seed, step, salt, lane) — the same counter-based-stream
design as the reference's per-point pcg32 (deps/pcg32, walk_on_stars.h:638)
but derived deterministically from the JAX key instead of wall-clock.

Quality: passes the mean/variance/correlation checks in tests/test_fastrand
— adequate for Monte Carlo estimation (not cryptographic).
"""
import jax
import jax.numpy as jnp

_M1 = jnp.uint32(747796405)
_A1 = jnp.uint32(2891336453)
_M2 = jnp.uint32(277803737)
_GOLD = jnp.uint32(2654435769)       # 2^32 / phi
_C_STEP = jnp.uint32(2246822519)
_C_SALT = jnp.uint32(3266489917)


def _pcg(x):
    """PCG-XSH output permutation over an LCG state (uint32 -> uint32)."""
    x = x * _M1 + _A1
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * _M2
    return (x >> jnp.uint32(22)) ^ x


def seed_from_key(key):
    """Collapse a JAX PRNG key into a uint32 stream seed."""
    data = jax.random.key_data(key).astype(jnp.uint32)
    return (data[..., 0] ^ (data[..., 1] * _GOLD)).astype(jnp.uint32)


def lane_iota(shape):
    """Unique uint32 id per lane position of `shape`."""
    n = 1
    for s in shape:
        n *= s
    return jax.lax.iota(jnp.uint32, n).reshape(shape)


def uniform(seed, step, salt, lanes):
    """U[0,1) per lane. seed: uint32 scalar; step/salt: int scalars;
    lanes: uint32 lane-id array (from lane_iota)."""
    x = lanes * _GOLD
    x = x ^ (jnp.uint32(step) * _C_STEP)
    x = x ^ (jnp.uint32(salt) * _C_SALT)
    x = x ^ seed
    bits = _pcg(_pcg(x))
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))
