import os

import jax.numpy as jnp
import numpy as np

from nmcfluid.geometry.obj_io import (read_obj_2d, read_obj_3d,
                                      write_obj_2d, write_obj_3d)
from nmcfluid.geometry.svg import parse_path, svg_to_parts
from nmcfluid.scenes.custom import polygon_sdf, scene_from_obj


def test_obj_2d_roundtrip(tmp_path):
    v = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]
    s = [[0, 1], [1, 2], [2, 0]]
    p = os.path.join(tmp_path, "t.obj")
    write_obj_2d(p, v, s)
    v2, s2 = read_obj_2d(p)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(s2, s)


def test_obj_3d_fan_triangulation(tmp_path):
    p = os.path.join(tmp_path, "q.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, fcs = read_obj_3d(p)
    assert fcs.shape == (2, 3)


def test_parse_path_lines_and_close():
    polys = parse_path("M 0 0 L 1 0 L 1 1 Z")
    assert len(polys) == 1
    np.testing.assert_allclose(polys[0],
                               [[0, 0], [1, 0], [1, 1], [0, 0]])


def test_parse_path_cubic_flattening():
    polys = parse_path("M 0 0 C 0 1 1 1 1 0", samples=8)
    p = polys[0]
    assert p.shape == (9, 2)
    np.testing.assert_allclose(p[-1], [1, 0], atol=1e-12)
    assert p[:, 1].max() > 0.5     # bulges toward control points


def test_svg_to_parts(tmp_path):
    svg = os.path.join(tmp_path, "a.svg")
    with open(svg, "w") as f:
        f.write('<svg xmlns="http://www.w3.org/2000/svg">'
                '<rect x="0" y="0" width="2" height="1"/>'
                '<path d="M 0 0 L 1 1"/></svg>')
    parts = svg_to_parts(svg)
    assert len(parts) == 2
    verts, segs = parts[0]
    assert len(segs) == 4          # closed rect


def test_polygon_sdf_sign_and_distance():
    v = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    s = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    f = polygon_sdf(v, s)
    x = jnp.asarray([[0.5, 0.5], [2.0, 0.5], [0.5, -0.25]])
    d = np.asarray(f(x))
    assert d[0] < 0 and abs(d[0] + 0.5) < 1e-5
    assert abs(d[1] - 1.0) < 1e-5
    assert abs(d[2] - 0.25) < 1e-5


def test_scene_from_obj_with_interior_obstacle(tmp_path):
    # outer box + inner square obstacle
    v = [[0, 0], [4, 0], [4, 2], [0, 2],
         [1.8, 0.8], [2.2, 0.8], [2.2, 1.2], [1.8, 1.2]]
    s = [[0, 1], [1, 2], [2, 3], [3, 0],
         [5, 4], [6, 5], [7, 6], [4, 7]]   # obstacle wound cw
    p = os.path.join(tmp_path, "scene.obj")
    write_obj_2d(p, v, s)
    spec = scene_from_obj("myscene", p)
    assert spec.scene_size == (0.0, 4.0, 0.0, 2.0)
    assert spec.obstacle_sdf is not None
    d = np.asarray(spec.obstacle_sdf(jnp.asarray([[2.0, 1.0], [0.5, 0.5]])))
    assert d[0] < 0 < d[1]
    assert spec.boundary.a.shape[0] >= 8
    m = np.asarray(spec.fluid_mask(jnp.asarray([[2.0, 1.0], [0.5, 0.5]])))
    assert not m[0] and m[1]


def test_pfm_roundtrip(tmp_path):
    from nmcfluid.utils.pfm import read_pfm, write_pfm
    a = np.random.default_rng(0).standard_normal((7, 5)).astype(np.float32)
    p = os.path.join(tmp_path, "x.pfm")
    write_pfm(p, a)
    b, scale = read_pfm(p)
    np.testing.assert_array_equal(a, b)
    c = np.random.default_rng(1).random((4, 6, 3)).astype(np.float32)
    write_pfm(p, c)
    d, _ = read_pfm(p)
    np.testing.assert_array_equal(c, d)
