"""The closed-form head solve (sim.fluid._ls_head_solve, --ls_head).

Its correctness rests on two facts, each tested here:
  1. every scene's hard-BC wrapper (models/boundary.py) is AFFINE in the
     raw network output at fixed x — so the phase loss is exactly
     quadratic in the final linear layer;
  2. given that, the ridge solve lands the head at the optimum: when the
     target is realizable by some head on the same trunk, one solve
     recovers it to float precision from an arbitrary head.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.models.boundary import apply_boundary
from nmcfluid.models.siren import apply_siren
from nmcfluid.scenes import SCENES, get_scene
from nmcfluid.sim import NeuralFluid
from nmcfluid.sim.fluid import _fit_advect, _ls_head_solve
from nmcfluid.wost.solver import WalkSettings


def tiny_fluid(name="taylorgreen", **over):
    scene = get_scene(name)
    scene = dataclasses.replace(
        scene, max_n_iters=over.pop("max_n_iters", 50),
        _boundary_builder=scene._boundary_builder,
        _source_builder=scene._source_builder,
        _obstacle_sdf_builder=scene._obstacle_sdf_builder)
    over.setdefault("walk_settings", WalkSettings(n_walks=8,
                                                  walk_step_cap=8))
    return NeuralFluid(
        scene,
        sample_resolution=over.pop("sample_resolution", 16),
        wost_resolution=over.pop("wost_resolution", 16),
        div_resolution=over.pop("div_resolution", 32),
        **over)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_boundary_wrapper_is_affine_in_raw_output(name):
    """g(v1 + v2) - g(v1) - g(v2) + g(0) == 0 for every scene policy."""
    scene = get_scene(name)
    dim = scene.dim
    key = jax.random.PRNGKey(3)
    k1, k2, kx = jax.random.split(key, 3)
    lo = jnp.asarray([scene.scene_size[2 * i] for i in range(dim)])
    hi = jnp.asarray([scene.scene_size[2 * i + 1] for i in range(dim)])
    x = lo + (hi - lo) * jax.random.uniform(kx, (512, dim))
    v1 = jax.random.normal(k1, (512, dim))
    v2 = jax.random.normal(k2, (512, dim))
    eps = jnp.float32(scene.bdry_eps)
    bc_key = jax.random.PRNGKey(7)

    def g(v):
        return apply_boundary(scene, v, x, eps=eps, t=3, key=bc_key)

    lhs = g(v1 + v2)
    rhs = g(v1) + g(v2) - g(jnp.zeros_like(v1))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=1e-5)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_velocity_affine_matches_wrapper(name):
    """A(x) @ raw + c(x) reproduces apply_boundary for arbitrary raw."""
    fluid = tiny_fluid(name)
    scene = fluid.scene
    dim = scene.dim
    key = jax.random.PRNGKey(11)
    kx, kv = jax.random.split(key)
    lo = jnp.asarray([scene.scene_size[2 * i] for i in range(dim)])
    hi = jnp.asarray([scene.scene_size[2 * i + 1] for i in range(dim)])
    x = lo + (hi - lo) * jax.random.uniform(kx, (300, dim))
    raw = jax.random.normal(kv, (300, dim))
    eps = jnp.float32(scene.bdry_eps)
    A, c = fluid.velocity_affine(x, eps=eps, t=2)
    direct = apply_boundary(scene, raw, x, eps=eps, t=2,
                            key=jax.random.PRNGKey(7))
    recon = jnp.einsum('nde,ne->nd', A, raw) + c
    np.testing.assert_allclose(np.asarray(recon), np.asarray(direct),
                               atol=1e-5)


@pytest.mark.parametrize("name", ["taylorgreen", "jpipe", "smoke"])
def test_ls_head_recovers_realizable_target(name):
    """Target produced by a 'true' head on the same trunk: one solve from
    a perturbed head must drive the phase loss to ~float precision."""
    fluid = tiny_fluid(name, ls_head=2)
    scene = fluid.scene
    state = fluid.init_state(seed=0)
    params_true = state.params
    eps = state.eps
    t = jnp.int32(1)
    key = jax.random.PRNGKey(5)

    # corrupt the head; keep the trunk
    W, b = params_true[-1]
    kw, kb2, key = jax.random.split(key, 3)
    params_bad = params_true[:-1] + [
        (W + 0.3 * jax.random.normal(kw, W.shape),
         b + 0.3 * jax.random.normal(kb2, b.shape))]

    from nmcfluid.sim import sampling

    class B:
        @staticmethod
        def batch(kb):
            pts, valid = sampling.training_points(
                kb, fluid.n_batch, scene, scene.sample_pattern,
                fluid.sample_resolution)
            target = fluid.velocity(params_true, pts, eps=eps, t=t)
            return pts, target, valid.astype(jnp.float32)

        @staticmethod
        def velocity(params, x):
            return fluid.velocity(params, x, eps=eps, t=t)

        @staticmethod
        def features(params, x):
            from nmcfluid.models.siren import apply_siren_features
            return apply_siren_features(params, fluid.siren_cfg, x)

        @staticmethod
        def affine(x):
            return fluid.velocity_affine(x, eps=eps, t=t)

    def loss(params):
        x, target, w = B.batch(jax.random.PRNGKey(99))
        u = B.velocity(params, x)
        se = jnp.sum((u - target) ** 2, axis=-1)
        return jnp.sum(w * se) / jnp.maximum(jnp.sum(w), 1.0)

    before = float(loss(params_bad))
    solved = _ls_head_solve(fluid, params_bad, key, B)
    after = float(loss(solved))
    assert before > 1e-3          # the corruption was real
    assert after < 1e-8           # the solve removed it in one step
    # the solve only touches the head; the trunk must be bit-identical
    for (w0, b0), (w1, b1) in zip(params_bad[:-1], solved[:-1]):
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def _source_eval_loss(fluid, params, eps):
    """Fresh-batch loss of `params` against the scene's initial field."""
    from nmcfluid.sim import sampling
    pts, valid = sampling.training_points(
        jax.random.PRNGKey(7), fluid.n_batch, fluid.scene,
        fluid.scene.sample_pattern, fluid.sample_resolution)
    target = fluid.scene.source_velocity(pts, key=jax.random.PRNGKey(8))
    u = fluid.velocity(params, pts, eps=eps, t=0)
    w = valid.astype(jnp.float32)
    return float(jnp.sum(w * jnp.sum((u - target) ** 2, -1))
                 / jnp.maximum(jnp.sum(w), 1.0))


def test_ls_head_improves_partially_trained_source_fit():
    """On a partially-trained trunk the head solve is feature regression
    onto the target and must improve the eval loss. (On a RAW trunk it
    cannot: SIREN's sin(30.) init makes the features high-frequency
    noise w.r.t. the smooth TG target — measured in-sample reduction is
    ~rank/N, chance level — so the premise needs a trained trunk.)"""
    losses = {}
    for ls in (0, 4):
        fluid = tiny_fluid("taylorgreen", max_n_iters=500, ls_head=ls)
        state = fluid.init_state(seed=1)
        state = fluid.add_source(state)
        losses[ls] = _source_eval_loss(fluid, state.params, state.eps)
    assert losses[4] < 0.99 * losses[0]


def test_ls_head_guard_keeps_endpoint_on_untrained_trunk():
    """At 100 iters the trunk is still init noise: the head span holds
    ~none of the residual, so the fresh-batch guard must keep the Adam
    endpoint rather than inject the solve's sampling noise."""
    losses = {}
    for ls in (0, 4):
        fluid = tiny_fluid("taylorgreen", max_n_iters=100, ls_head=ls)
        state = fluid.init_state(seed=1)
        state = fluid.add_source(state)
        losses[ls] = _source_eval_loss(fluid, state.params, state.eps)
    assert losses[4] <= 1.02 * losses[0]


def test_ls_head_does_no_harm_near_convergence():
    """The warm-started advection fit at TG's tiny dt is already at its
    fixed point; the fresh-batch guard must keep the solve from
    injecting sampling noise there (bounded regression, not blow-up)."""
    losses = {}
    for ls in (0, 2):
        fluid = tiny_fluid("taylorgreen", max_n_iters=60, ls_head=ls)
        state = fluid.init_state(seed=1)
        state = fluid.add_source(state)
        key = jax.random.PRNGKey(42)
        params, _ = _fit_advect(fluid, False, state.params, state.params,
                                state.params, jnp.float32(fluid.scene.dt),
                                key, state.eps, jnp.int32(1))
        from nmcfluid.sim import sampling
        pts, valid = sampling.training_points(
            jax.random.PRNGKey(7), fluid.n_batch, fluid.scene,
            fluid.scene.sample_pattern, fluid.sample_resolution)
        u_prev = fluid.velocity(state.params, pts, eps=state.eps, t=1)
        back = jnp.clip(pts - u_prev * fluid.scene.dt, fluid._bbox_lo,
                        fluid._bbox_hi)
        target = fluid.velocity(state.params, back, eps=state.eps, t=1)
        u = fluid.velocity(params, pts, eps=state.eps, t=1)
        w = valid.astype(jnp.float32)
        losses[ls] = float(jnp.sum(w * jnp.sum((u - target) ** 2, -1))
                           / jnp.maximum(jnp.sum(w), 1.0))
    # same budget, independent eval batch: the guarded solve may differ
    # by eval-batch noise but must not regress materially
    assert losses[2] <= 4.0 * losses[0] + 1e-6
