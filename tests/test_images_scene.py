"""Image-driven scene construction (scenes/images.py) — the zombie
demo's primary ctor (demo/scene.h:22-52): boundary OBJ + is_neumann mask
+ boundary-value/source images -> mixed-BC WostScene."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmcfluid.scenes.images import (image_lookup_fn, load_gray,
                                    scene_from_images)
from nmcfluid.utils.pfm import write_pfm
from nmcfluid.wost import WalkSettings, estimate_solution

ENGINE = "/root/reference/bindings/zombie/demo/scenes/engine"


def _box_obj(path, lo=0.0, hi=2.0):
    # ccw square loop; scene_from_images flips orientation by default
    v = [(lo, lo), (hi, lo), (hi, hi), (lo, hi)]
    with open(path, "w") as f:
        for x, y in v:
            f.write(f"v {x} {y}\n")
        for i in range(4):
            f.write(f"l {i + 1} {(i + 1) % 4 + 1}\n")


def test_image_lookup_orientation_and_clamp():
    # arr[i, j] distinct per cell; uv.y rides rows from the TOP-DOWN array
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    fn = image_lookup_fn(arr, np.zeros(2), 1.0)
    x = jnp.asarray([[0.1, 0.1],     # row 0, col 0
                     [0.9, 0.1],     # row 0, col 3
                     [0.1, 0.9],     # row 2, col 0
                     [5.0, -3.0]])   # clamped -> row 0, col 3
    np.testing.assert_array_equal(np.asarray(fn(x)), [0.0, 3.0, 8.0, 3.0])


def test_mask_splits_segments(tmp_path):
    obj = tmp_path / "box.obj"
    _box_obj(obj)
    # left half of the image white (neumann), right half black (dirichlet)
    isn = np.ones((16, 16), np.float32)
    isn[:, 8:] = 0.0
    scene, meta = scene_from_images(str(obj), is_neumann=isn)
    # x-midpoints: left wall 0.0 -> col 0 (neumann); right wall 2.0 ->
    # col 15 (dirichlet); bottom/top midpoints x=1.0 -> col 8 (dirichlet)
    np.testing.assert_array_equal(
        meta["is_neumann_seg"],
        [m[0] < 1.0 for m in
         0.5 * (meta["verts"][meta["segs"][:, 0]]
                + meta["verts"][meta["segs"][:, 1]])])
    assert scene.dirichlet is not None
    assert int(meta["is_neumann_seg"].sum()) == 1


def test_pfm_roundtrip_matches_array(tmp_path):
    arr = np.random.default_rng(0).random((9, 7)).astype(np.float32)
    p = tmp_path / "a.pfm"
    write_pfm(str(p), arr)
    np.testing.assert_allclose(load_gray(str(p)), arr, rtol=1e-6)


def test_images_mixed_bc_solution(tmp_path):
    """End-to-end: the test_dirichlet manufactured problem posed FROM
    IMAGES — box with Neumann x-walls / Dirichlet y-walls, g = p* drawn
    into a bitmap, solved to the closed form (image-resolution bias
    bounded by the nearest-cell cell size)."""
    L, sig = 2.0, 5.0
    kx = np.pi / L
    obj = tmp_path / "box.obj"
    _box_obj(obj, 0.0, L)
    R = 256
    yy, xx = np.meshgrid((np.arange(R) + 0.5) / R * L,
                         (np.arange(R) + 0.5) / R * L, indexing="ij")
    p_star_img = (np.cos(kx * xx) * np.cos(kx * yy)).astype(np.float32)
    f_img = ((sig + 2.0 * kx ** 2) * p_star_img).astype(np.float32)
    isn = np.zeros((R, R), np.float32)
    isn[R // 8: -R // 8, :] = 1.0          # y-extreme rows -> dirichlet

    scene, meta = scene_from_images(
        str(obj), source=f_img, dirichlet_value=p_star_img,
        is_neumann=isn, absorption=sig)
    assert scene.dirichlet is not None and scene.dirichlet_fn is not None

    pts = jnp.asarray([[1.0, 0.4], [0.6, 1.5]], jnp.float32)
    settings = WalkSettings(walk_step_cap=128, ignore_dirichlet=False)
    p, n_valid, _ = estimate_solution(scene, settings, pts,
                                      jax.random.PRNGKey(0), 2000)
    want = np.cos(kx * np.asarray(pts)[:, 0]) \
        * np.cos(kx * np.asarray(pts)[:, 1])
    np.testing.assert_allclose(np.asarray(p), want, atol=0.07)
    assert np.all(np.asarray(n_valid) > 1200)


@pytest.mark.skipif(not os.path.isdir(ENGINE),
                    reason="reference engine assets not present")
def test_engine_assets_build_and_solve():
    data = os.path.join(ENGINE, "data")
    scene, meta = scene_from_images(
        os.path.join(data, "geometry.obj"),
        dirichlet_value=os.path.join(data, "dirichlet_boundary_value.pfm"),
        is_neumann=os.path.join(data, "is_neumann.png"))
    assert len(meta["segs"]) == 647
    assert int((~meta["is_neumann_seg"]).sum()) == 249
    settings = WalkSettings(epsilon_shell=1e-3, min_star_radius=1e-3,
                            russian_roulette_threshold=0.0,
                            walk_step_cap=64, max_walk_length=64,
                            ignore_dirichlet=False, ignore_source=True)
    pts = jnp.asarray([[500.0, 500.0], [300.0, 700.0]], jnp.float32)
    p, n_valid, _ = estimate_solution(scene, settings, pts,
                                      jax.random.PRNGKey(0), 16)
    assert np.all(np.isfinite(np.asarray(p)))
    assert np.all(np.asarray(p) >= -0.05) and np.all(np.asarray(p) <= 1.3)
