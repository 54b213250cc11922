"""INSR-PDE fluid baseline (Wu et al.) in JAX.

Rebuild of experiments/INSR-PDE/fluid/model.py: three networks — velocity,
velocity_prev, and a *pressure network* — stepped by
  advect   : semi-Lagrangian fit + soft wall penalty        (:74-101)
  pressure : PINN fit of lap p = div u + Neumann penalty    (:104-125)
  project  : fit u_prev - grad p + soft wall penalty        (:127-151)
Soft boundary losses on 1%-of-batch wall samples replace the main method's
hard BCs.
"""
import jax
import jax.numpy as jnp

from .common import (SegmentedAdam, SirenConfig, apply_siren, init_siren,
                     sample_boundary, sample_interior, tg_velocity)


class INSRFluid:
    def __init__(self, num_hidden_layers=3, hidden_features=256, lr=1e-4,
                 max_n_iters=20_000, sample_resolution=128, dt=0.001,
                 bc_weight=1.0):
        # defaults = the reference experiment's shipped config
        # (scripts/fluid2Dtlgn.sh: 3 layers x 256, -sr 128, dt 1e-3;
        # config.py:107-108: max_n_iters 20000, lr 1e-4)
        self.vel_cfg = SirenConfig(2, 2, num_hidden_layers, hidden_features)
        self.p_cfg = SirenConfig(2, 1, num_hidden_layers, hidden_features)
        self.max_n_iters = max_n_iters
        self.n = sample_resolution ** 2
        self.dt = dt
        self.bc_weight = bc_weight
        # one fitter per phase, built once: each caches its compiled
        # <=5k-trip Adam segment (SegmentedAdam docstring) across frames.
        # plateau=True = the reference's ReduceLROnPlateau per phase
        # (base/baseModel.py:61, factor 0.1 / patience 500 / min_lr 1e-8)
        self._fits = {
            "source": SegmentedAdam(self._source_loss, lr, plateau=True),
            "advect": SegmentedAdam(self._advect_loss, lr, plateau=True),
            "pressure": SegmentedAdam(self._pressure_loss, lr,
                                      plateau=True),
            "project": SegmentedAdam(self._project_loss, lr, plateau=True),
        }

    def init(self, seed=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return dict(vel=init_siren(k1, self.vel_cfg),
                    p=init_siren(k2, self.p_cfg))

    def _vel(self, params, x):
        return apply_siren(params, self.vel_cfg, x)

    def _bc_loss(self, params, kb):
        xv, xh = sample_boundary(kb, self.n // 100)
        vx = self._vel(params, xv)[..., 0]
        vy = self._vel(params, xh)[..., 1]
        return (jnp.mean(vx ** 2) + jnp.mean(vy ** 2)) * self.bc_weight

    # ---- per-phase losses (loss(params, key_i, *ctx); ctx carries the
    # frozen nets of the phase so one compiled fitter serves all frames)

    def _source_loss(self, p, ki):
        x = sample_interior(ki, self.n)
        main = jnp.mean((self._vel(p, x) - tg_velocity(x)) ** 2)
        return main + self._bc_loss(p, jax.random.fold_in(ki, 1))

    def _advect_loss(self, p, ki, prev):
        x = sample_interior(ki, self.n)
        u_prev = self._vel(prev, x)
        back = jnp.clip(x - u_prev * self.dt, -1.0, 1.0)
        target = self._vel(prev, back)
        main = jnp.mean((self._vel(p, x) - target) ** 2)
        return main + self._bc_loss(p, jax.random.fold_in(ki, 1))

    def _pressure_loss(self, pp, ki, vel_params):
        """lap p = div u with Neumann walls (model.py:104-125)."""
        x = sample_interior(ki, self.n)

        def u_fn(pt):
            return apply_siren(vel_params, self.vel_cfg, pt)

        def p_fn(pt):
            return jnp.reshape(apply_siren(pp, self.p_cfg, pt), ())

        div_u = jnp.trace(jax.vmap(jax.jacfwd(u_fn))(x), axis1=-2,
                          axis2=-1)
        lap_p = jnp.trace(jax.vmap(jax.hessian(p_fn))(x), axis1=-2,
                          axis2=-1)
        main = jnp.mean((div_u - lap_p) ** 2)
        xv, xh = sample_boundary(jax.random.fold_in(ki, 1), self.n // 100)
        gpx = jax.vmap(jax.grad(p_fn))(xv)[..., 0]
        gpy = jax.vmap(jax.grad(p_fn))(xh)[..., 1]
        return main + jnp.mean(gpx ** 2) + jnp.mean(gpy ** 2)

    def _project_loss(self, p, ki, prev, p_params):
        x = sample_interior(ki, self.n)
        u_prev = self._vel(prev, x)

        def p_fn(pt):
            return jnp.reshape(apply_siren(p_params, self.p_cfg, pt), ())

        grad_p = jax.vmap(jax.grad(p_fn))(x)
        main = jnp.mean((self._vel(p, x) - (u_prev - grad_p)) ** 2)
        return main + self._bc_loss(p, jax.random.fold_in(ki, 1))

    # ---- phase drivers

    def fit_source(self, params, key):
        return self._fits["source"].fit(params, key, self.max_n_iters)

    def advect(self, params, prev, key):
        return self._fits["advect"].fit(params, key, self.max_n_iters,
                                        ctx=(prev,))[0]

    def solve_pressure(self, p_params, vel_params, key):
        return self._fits["pressure"].fit(p_params, key, self.max_n_iters,
                                          ctx=(vel_params,))[0]

    def project(self, params, prev, p_params, key):
        return self._fits["project"].fit(params, key, self.max_n_iters,
                                         ctx=(prev, p_params))[0]

    def step(self, state, key):
        """One INSR timestep: advect -> pressure -> project."""
        k1, k2, k3 = jax.random.split(key, 3)
        prev = state["vel"]
        vel = self.advect(state["vel"], prev, k1)
        p = self.solve_pressure(state["p"], vel, k2)
        vel2 = self.project(vel, vel, p, k3)
        return dict(vel=vel2, p=p)
