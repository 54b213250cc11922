"""Multi-obstacle karman scenes (round-4 verdict ask #2).

The reference ships 2-/3-cylinder karman geometries
(src/3d/wost/geometry_2cyl.obj, geometry_3cyl.obj) and its driver
extracts interior obstacle loops generically (src/2d/main.py:36-59,
89-106). These tests make this repo's multi-obstacle path real:
polygon_sdf over two loops, obstacle-rejection sampling around multiple
cylinders, the Nystrom BEM system on a multi-loop boundary, a custom
2-loop OBJ through scene_from_obj, and the walk estimator on the
karman2cyl analytic boundary.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nmcfluid.scenes import get_scene
from nmcfluid.scenes.custom import polygon_sdf, scene_from_obj
from nmcfluid.sim import sampling
from nmcfluid.sim.bem import BemProjector, closed_loops, equispaced_boundary


def test_ncyl_sdf_and_mask():
    scene = get_scene("karman2cyl")
    obs = scene.obstacles
    centers = jnp.asarray([[o[0], o[1]] for o in obs], jnp.float32)
    s = scene.obstacle_sdf(centers)
    assert np.all(np.asarray(s) < 0.0)          # inside each cylinder
    mid = jnp.asarray([[-0.5, 0.0], [1.0, 0.5]], jnp.float32)
    assert np.all(np.asarray(scene.obstacle_sdf(mid)) > 0.0)
    m = scene.fluid_mask(jnp.concatenate([centers, mid]))
    assert np.asarray(m).tolist() == [False, False, True, True]


def test_fluid_points_reject_all_obstacles():
    scene = get_scene("karman3cyl")
    pts, valid = sampling.fluid_points(jax.random.PRNGKey(0), 4096, scene)
    s = np.asarray(scene.obstacle_sdf(pts))
    v = np.asarray(valid)
    assert v.sum() > 3500
    assert np.all(s[v] > 0.0)


def test_polygon_sdf_two_loops():
    """Crossing-number SDF over a soup holding TWO disjoint square
    loops: negative inside either, positive outside both."""
    sq = lambda cx, cy, h: np.asarray(
        [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
         (cx - h, cy + h)])
    verts = np.concatenate([sq(-1.0, 0.0, 0.2), sq(0.5, 0.1, 0.3)])
    loop = lambda o: np.asarray([(o + i, o + (i + 1) % 4)
                                 for i in range(4)])
    segs = np.concatenate([loop(0), loop(4)])
    f = polygon_sdf(verts, segs)
    x = jnp.asarray([[-1.0, 0.0], [0.5, 0.1],          # inside each
                     [-0.3, 0.0], [2.0, 2.0],          # outside both
                     [-1.15, 0.15]], jnp.float32)      # inside loop 1
    s = np.asarray(f(x))
    assert np.all(s[[0, 1, 4]] < 0.0), s
    assert np.all(s[[2, 3]] > 0.0), s


def test_scene_from_obj_two_loops(tmp_path):
    """A user OBJ with an outer box + two interior obstacle loops builds
    a working scene: correct bbox, both loops classified as obstacles,
    SDF negative inside each."""
    lines = []
    verts = []

    def add_loop(pts):
        base = len(verts)
        verts.extend(pts)
        n = len(pts)
        for i in range(n):
            lines.append((base + i + 1, base + (i + 1) % n + 1))

    add_loop([(-2.0, -1.0), (2.0, -1.0), (2.0, 1.0), (-2.0, 1.0)])
    t = 2 * np.pi * np.arange(12) / 12
    for cx, cy, r in [(-1.0, 0.0, 0.13), (0.0, 0.0, 0.13)]:
        add_loop([(cx + r * np.cos(a), cy + r * np.sin(a)) for a in t])

    p = tmp_path / "twocyl.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} 0\n")
        for a, b in lines:
            f.write(f"l {a} {b}\n")

    spec = scene_from_obj("user2cyl", str(p))
    assert spec.scene_size == (-2.0, 2.0, -1.0, 1.0)
    sdf = spec.obstacle_sdf
    inside = np.asarray(sdf(jnp.asarray([[-1.0, 0.0], [0.0, 0.0]],
                                        jnp.float32)))
    outside = np.asarray(sdf(jnp.asarray([[-0.5, 0.0], [1.5, 0.5]],
                                         jnp.float32)))
    assert np.all(inside < 0.0) and np.all(outside > 0.0)
    # boundary soup holds every segment (4 walls + 2 x 12 circle segs)
    assert int(spec.boundary.a.shape[0]) >= 28


def test_bem_multiloop_boundary_cache():
    """equispaced_boundary on the 3-loop karman2cyl boundary: weights sum
    to the exact perimeter, normals unit and outward on each cylinder."""
    scene = get_scene("karman2cyl")
    loops = closed_loops(scene)
    assert len(loops) == 3                        # box + 2 cylinders
    pts, nrm, w = equispaced_boundary(loops, 1024)
    perim = sum(np.linalg.norm(np.roll(v, -1, 0) - v, axis=1).sum()
                for v in loops)
    assert abs(w.sum() - perim) < 1e-9 * perim
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                               atol=1e-12)
    for cx, cy, r in scene.obstacles:
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        on = np.abs(d - r) < 1e-3
        assert on.sum() >= 8
        to_c = np.stack([cx - pts[on, 0], cy - pts[on, 1]], 1)
        to_c /= np.linalg.norm(to_c, axis=1, keepdims=True)
        # obstacle normals point INTO the cylinder (out of the fluid)
        assert np.all(np.sum(nrm[on] * to_c, axis=1) > 0.99)


def test_bem_multiloop_matches_wost():
    """The Nystrom system on the 2-cylinder boundary must agree with the
    MC walk estimator on a smooth source — the deterministic projection
    has never seen >1 obstacle loop before round 5."""
    from nmcfluid.wost.solver import WostScene, estimate_solution
    scene = get_scene("karman2cyl")
    ss = scene.scene_size
    bp = BemProjector(scene, 160, n_boundary=1536, eval_chunk=512)
    # cell-centered source grid at the projector's own resolution
    Rx, Ry = bp.res
    hx, hy = bp.spacing
    cx = ss[0] + (np.arange(Rx) + 0.5) * hx
    cy = ss[2] + (np.arange(Ry) + 0.5) * hy
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    g = np.sin(2.0 * X + 0.5) * np.cos(2.5 * Y)
    gj = jnp.asarray(g, jnp.float32)

    pts, valid = sampling.fluid_points(jax.random.PRNGKey(5), 512, scene)
    d = np.asarray(scene.obstacle_sdf(pts))
    walls = np.minimum(np.asarray(pts)[:, 1] - ss[2],
                       ss[3] - np.asarray(pts)[:, 1])
    sel = np.asarray(valid) & (d > 0.08) & (walls > 0.08)
    pts_s = jnp.asarray(np.asarray(pts)[sel][:16])

    p_b, _ = bp.solve(gj, pts_s)
    wsc = WostScene(
        dim=2, neumann=scene.boundary,
        source_fn=lambda y, grid: sampling.nearest_lookup(grid, ss, y),
        absorption=scene.absorption)
    p_w, _, _ = estimate_solution(wsc, scene.walk_settings(n_walks=256),
                                  pts_s, jax.random.PRNGKey(11),
                                  source_args=(gj,))
    scale = np.abs(np.asarray(p_w)).max()
    assert np.abs(np.asarray(p_b) - np.asarray(p_w)).max() < 0.12 * scale
