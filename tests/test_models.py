import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.models import SirenConfig, init_siren, apply_siren
from nmcfluid.models.boundary import apply_boundary, wall_ramp
from nmcfluid.scenes import get_scene, SCENES


def test_siren_shapes_and_init_ranges():
    cfg = SirenConfig(2, 2, num_hidden_layers=2, hidden_features=128)
    params = init_siren(jax.random.PRNGKey(0), cfg)
    # layers: in->H, H->H x (L), H->out  => L+2 weight mats
    assert len(params) == cfg.num_hidden_layers + 2
    w0 = np.asarray(params[0][0])
    assert np.all(np.abs(w0) <= 1.0 / 2 + 1e-7)          # U(+-1/fan_in)
    w1 = np.asarray(params[1][0])
    bound = np.sqrt(6.0 / 128) / 30.0
    assert np.all(np.abs(w1) <= bound + 1e-7)
    y = apply_siren(params, cfg, jnp.zeros((7, 5, 2)))
    assert y.shape == (7, 5, 2)


def test_siren_preactivation_distribution():
    # SIREN init keeps hidden pre-activations roughly arcsine/normal with
    # unit-ish scale; a loose sanity check that the stack neither explodes
    # nor collapses through 6 layers.
    cfg = SirenConfig(2, 2, num_hidden_layers=6, hidden_features=64)
    params = init_siren(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4096, 2), minval=-1,
                           maxval=1)
    h = x
    for w, b in params[:-1]:
        h = jnp.sin(30.0 * (h @ w + b))
        s = float(jnp.std(h))
        assert 0.3 < s < 1.2, s


def test_siren_jittable_and_differentiable():
    cfg = SirenConfig(2, 2, num_hidden_layers=2, hidden_features=32)
    params = init_siren(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def loss(p, x):
        return jnp.mean(apply_siren(p, cfg, x) ** 2)

    g = jax.grad(loss)(params, jnp.ones((16, 2)))
    assert all(np.all(np.isfinite(np.asarray(gw))) for gw, _ in g)


def test_wall_ramp_zero_on_walls_one_inside():
    w = wall_ramp(jnp.asarray([0.0, 0.05, 0.5, 0.95, 1.0]), 0.0, 1.0, 0.1)
    np.testing.assert_allclose(np.asarray(w), [0.0, 0.5, 1.0, 0.5, 0.0],
                               atol=1e-6)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_boundary_zeroes_normal_velocity_on_walls(name):
    scene = get_scene(name)
    ss = scene.scene_size
    dim = scene.dim
    key = jax.random.PRNGKey(0)
    # interior points + points exactly on each wall
    x = jax.random.uniform(key, (64, dim))
    lo = jnp.asarray([ss[2 * i] for i in range(dim)])
    hi = jnp.asarray([ss[2 * i + 1] for i in range(dim)])
    x = lo + x * (hi - lo)
    raw = jnp.ones((64, dim))
    for axis in range(dim):
        for val in (lo[axis], hi[axis]):
            xw = x.at[:, axis].set(val)
            v = apply_boundary(scene, raw, xw, eps=scene.bdry_eps, t=1,
                               key=key)
            v = np.asarray(v)
            if name in ("karman", "karman2cyl", "karman3cyl") \
                    and axis == 0:
                continue     # open channel: x walls are inlet/outlet
            if name == "karman3d" and axis == 2:
                continue     # open in z
            if name == "jpipe":
                continue     # walls are not the bbox; checked below
            assert np.all(np.abs(v[:, axis]) < 1e-5), (name, axis)


def test_karman_inlet_clamp():
    scene = get_scene("karman")
    ss = scene.scene_size
    x = jnp.stack([jnp.full((8,), ss[0] + 0.5 * scene.bdry_eps),
                   jnp.linspace(ss[2] + 0.2, ss[3] - 0.2, 8)], axis=-1)
    v = apply_boundary(scene, jnp.zeros((8, 2)), x, eps=scene.bdry_eps)
    np.testing.assert_allclose(np.asarray(v[:, 0]), scene.karman_vel,
                               atol=1e-6)


def test_jpipe_zero_outside_pipe():
    scene = get_scene("jpipe")
    x = jnp.asarray([[1.9, 0.1], [0.1, 1.9], [1.2, 1.8]])  # outside the J
    v = apply_boundary(scene, jnp.ones((3, 2)), x, eps=scene.bdry_eps)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-7)


def test_taylorgreen_source_is_divergence_free():
    from nmcfluid.ops.diff_ops import divergence
    scene = get_scene("taylorgreen")
    x = jax.random.uniform(jax.random.PRNGKey(3), (256, 2),
                           minval=1.0, maxval=5.0)
    div = divergence(lambda p: scene.source_velocity(p), x)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=2e-5)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_geometry_builds_and_contains_interior(name):
    from nmcfluid.geometry import queries2d, queries3d
    scene = get_scene(name)
    q = queries2d if scene.dim == 2 else queries3d
    soup = scene.boundary
    ss = scene.scene_size
    center = jnp.asarray([(ss[2 * i] + ss[2 * i + 1]) / 2
                          for i in range(scene.dim)])
    if name == "jpipe":
        center = jnp.asarray([0.5, 0.25])
    if name == "karman":
        center = jnp.asarray([0.5, 0.0])   # right of the cylinder
    d = q.distance(soup, center[None])
    assert float(d[0]) > 1e-3
    assert not bool(q.outside_bbox(soup, center[None])[0])


def test_smoke_source_jet_and_zero_far_field():
    scene = get_scene("smoke")
    key = jax.random.PRNGKey(0)
    x = jnp.asarray([[0.0, 0.0, -0.6], [0.5, 0.5, 0.5]])
    v = np.asarray(scene.source_velocity(x, key))
    assert abs(v[0, 2] - 0.2) < 0.11      # 0.2 +- 0.1 jitter
    np.testing.assert_allclose(v[1], 0.0, atol=1e-7)


def test_vortex_collide_opposed_jets():
    scene = get_scene("vortex_collide")
    x = jnp.asarray([[0.0, 0.0, -0.21], [0.0, 0.0, 0.21]])
    v = np.asarray(scene.source_velocity(x))
    assert v[0, 2] > 0.15 and v[1, 2] < -0.15
