"""Per-scene hard boundary conditions on the network velocity.

The reference bakes analytic boundary handling directly into
`query_velocity` as masked in-place edits (src/2d/models/base.py:158-224,
src/3d/models/base.py:188-276). Here each scene's policy is a pure function
  apply_boundary(scene, raw_vel, x, *, eps, t, key) -> vel
built from composable pieces: inlet clamps, linear wall ramps, obstacle-SDF
ramps, region masks. Masked in-place writes become `jnp.where`; the weights
depend only on x (the reference detaches them), so gradients flow exactly as
in the reference.

Scene catalog (matching base.py src names):
  taylorgreen  4-wall ramp                                (2d/base.py:182-189)
  karman       inlet u=karman_vel + obstacle ramp + y-wall ramp   (:169-180)
  jpipe        inlet clamp, corner normal-suppression, per-arm wall
               ramps, out-of-pipe zeroing                         (:191-222)
  smoke        jet sphere with time-seeded noise + 6-wall ramp
                                                     (3d/base.py:199-222)
  smoke_obs    jet w=1 + obstacle ramp + 6-wall ramp        (3d:224-245)
  vortex_collide  6-wall ramp                               (3d:246-256)
  karman3d     inlet w=karman_vel + obstacle ramp + x/y-wall ramp (3d:258-274)
"""
import jax
import jax.numpy as jnp

from ..geometry.sdf import jpipe_walls, jpipe_interior_mask

_jpipe_sdf = jpipe_walls()
_jpipe_mask = jpipe_interior_mask()


def wall_ramp(coord, lo, hi, eps):
    """min(|c-lo|, |c-hi|) clamped to [0, eps], / eps — the reference's
    linear no-through-flow ramp (base.py:176-177)."""
    w = jnp.minimum(jnp.clip(jnp.abs(coord - lo), 0.0, eps),
                    jnp.clip(jnp.abs(coord - hi), 0.0, eps)) / eps
    return w


def sdf_ramp(sdf_vals, eps):
    """clamp(d, 0, eps)/eps — no-slip ramp off an obstacle SDF
    (base.py:352-358, smoothstep_circular_obs)."""
    return jnp.clip(sdf_vals, 0.0, eps) / eps


def apply_boundary(scene, vel, x, *, eps, t=0, key=None):
    """Apply scene's hard BCs to raw network output vel at points x.

    scene: a SceneSpec (nmcfluid.scenes) carrying name, scene_size,
    obstacle_sdf, karman_vel. t is the integer timestep (smoke noise seed,
    3d/base.py:205)."""
    name = scene.name
    ss = scene.scene_size

    if name == "taylorgreen":
        u_w = wall_ramp(x[..., 0], ss[0], ss[1], eps)
        v_w = wall_ramp(x[..., 1], ss[2], ss[3], eps)
        return vel * jnp.stack([u_w, v_w], axis=-1)

    if name in ("karman", "karman2cyl", "karman3cyl"):
        # multi-cylinder variants share the karman policy: obstacle_sdf
        # is the min over circles, so the sdf ramp pins every cylinder
        inlet = (x[..., 0] >= ss[0]) & (x[..., 0] <= ss[0] + eps)
        u = jnp.where(inlet, scene.karman_vel, vel[..., 0])
        vel = jnp.stack([u, vel[..., 1]], axis=-1)
        vel = vel * sdf_ramp(scene.obstacle_sdf(x), eps)[..., None]
        v_w = wall_ramp(x[..., 1], ss[2], ss[3], eps)
        return vel * jnp.stack([jnp.ones_like(v_w), v_w], axis=-1)

    if name == "jpipe":
        inlet = ((x[..., 0] >= 0.0) & (x[..., 0] <= 0.1)
                 & (x[..., 1] >= 0.0) & (x[..., 1] <= 0.5))
        u = jnp.where(inlet, scene.karman_vel, vel[..., 0])
        vel = jnp.stack([u, vel[..., 1]], axis=-1)

        # corner region: suppress the radial (normal) component by the wall
        # distance so flow follows the bend (base.py:199-204)
        m1 = (x[..., 0] >= 0.0) & (x[..., 0] <= 1.0)
        m2 = (x[..., 1] >= 1.0) & (x[..., 1] <= 2.0)
        corner = ~m1 & ~m2
        n = x - jnp.asarray([1.0, 1.0], jnp.float32)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        u_n = jnp.sum(n * vel, -1, keepdims=True) * n
        dist = _jpipe_sdf(x)
        bent = (vel - u_n) + dist[..., None] * u_n
        vel = jnp.where(corner[..., None], bent, vel)

        # per-arm wall ramps (base.py:206-215)
        v_w = jnp.where(m1, wall_ramp(x[..., 1], 0.0, 0.5, eps), 1.0)
        u_w = jnp.where(m2, wall_ramp(x[..., 0], 1.5, 2.0, eps), 1.0)
        vel = vel * jnp.stack([u_w, v_w], axis=-1)

        # zero outside the pipe (base.py:217-222)
        return jnp.where(_jpipe_mask(x)[..., None], vel, 0.0)

    if name in ("smoke", "smoke_obs"):
        center = jnp.asarray([0.0, 0.0, -0.6], jnp.float32)
        in_jet = jnp.linalg.norm(x - center, axis=-1) < 0.1
        if name == "smoke":
            # time-seeded jitter (3d/base.py:205-210): the reference re-seeds
            # numpy with the timestep; here a timestep-folded key, one draw
            # per point (statistically equivalent)
            k = jax.random.fold_in(key, t) if key is not None \
                else jax.random.PRNGKey(t)
            r = 10.0 * (2.0 * jax.random.uniform(k, x.shape[:-1]) - 1.0)
            jet = jnp.stack([0.01 * r, 0.01 * r, 0.2 + 0.01 * r], axis=-1)
            vel = jnp.where(in_jet[..., None], jet, vel)
        else:
            w = jnp.where(in_jet, 1.0, vel[..., 2])
            vel = jnp.concatenate([vel[..., :2], w[..., None]], axis=-1)
            vel = vel * sdf_ramp(scene.obstacle_sdf(x), eps)[..., None]
        u_w = wall_ramp(x[..., 0], ss[0], ss[1], eps)
        v_w = wall_ramp(x[..., 1], ss[2], ss[3], eps)
        w_w = wall_ramp(x[..., 2], ss[4], ss[5], eps)
        return vel * jnp.stack([u_w, v_w, w_w], axis=-1)

    if name == "vortex_collide":
        u_w = wall_ramp(x[..., 0], ss[0], ss[1], eps)
        v_w = wall_ramp(x[..., 1], ss[2], ss[3], eps)
        w_w = wall_ramp(x[..., 2], ss[4], ss[5], eps)
        return vel * jnp.stack([u_w, v_w, w_w], axis=-1)

    if name == "karman3d":
        inlet = (x[..., 2] >= ss[4]) & (x[..., 2] <= ss[4] + eps)
        w = jnp.where(inlet, scene.karman_vel, vel[..., 2])
        vel = jnp.concatenate([vel[..., :2], w[..., None]], axis=-1)
        vel = vel * sdf_ramp(scene.obstacle_sdf(x), eps)[..., None]
        u_w = wall_ramp(x[..., 0], ss[0], ss[1], eps)
        v_w = wall_ramp(x[..., 1], ss[2], ss[3], eps)
        return vel * jnp.stack([u_w, v_w, jnp.ones_like(u_w)], axis=-1)

    raise NotImplementedError(f"unknown scene {name!r}")
