"""Volume-render compositing math (tools_render_density3d.composite)."""
import numpy as np

from nmcfluid.tools_render_density3d import composite


def test_zero_density_returns_background():
    rho = np.zeros((8, 8, 8), np.float32)
    col = np.ones(rho.shape + (3,), np.float32)
    img = composite(rho, col, axis=1, bg=1.0)
    np.testing.assert_allclose(img, 1.0, atol=1e-6)
    img0 = composite(rho, col, axis=1, bg=0.25)
    np.testing.assert_allclose(img0, 0.25, atol=1e-6)


def test_uniform_slab_matches_beer_lambert():
    # homogeneous medium: weights sum to 1 - T_total with
    # T_total = prod(1 - alpha) -> exp(-absorb * rho) as slabs -> inf
    n, absorb, rho0 = 64, 60.0, 0.02
    rho = np.full((n, n, n), rho0, np.float32)
    col = np.ones(rho.shape + (3,), np.float32) * 0.5
    img = composite(rho, col, axis=0, absorb=absorb, bg=1.0)
    alpha = 1.0 - np.exp(-absorb * rho0 / n)
    t_total = (1.0 - alpha) ** n
    expect = 0.5 * (1.0 - t_total) + 1.0 * t_total
    np.testing.assert_allclose(img, expect, rtol=1e-5)


def test_front_slab_occludes_back():
    # an opaque red slab in front of an opaque blue slab, integrating
    # along axis 0 front-to-back: red wins
    rho = np.zeros((4, 2, 2), np.float32)
    rho[0] = 1e6      # front (first slab) fully opaque
    rho[2] = 1e6      # behind it
    col = np.zeros(rho.shape + (3,), np.float32)
    col[0, ..., 0] = 1.0   # red front
    col[2, ..., 2] = 1.0   # blue back
    img = composite(rho, col, axis=0, absorb=60.0, bg=0.0)
    np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(img[..., 2], 0.0, atol=1e-5)


def test_view_axis_selects_projection():
    # a density line along x collapses to a point for the x-view and to a
    # line for the y-view
    rho = np.zeros((8, 8, 8), np.float32)
    rho[:, 3, 4] = 10.0
    col = np.ones(rho.shape + (3,), np.float32)
    img_x = composite(rho, col, axis=0, bg=0.0)   # (y, z) image
    img_y = composite(rho, col, axis=1, bg=0.0)   # (x, z) image
    assert (img_x.sum(axis=-1) > 0.1).sum() == 1          # single pixel
    assert (img_y.sum(axis=-1) > 0.1).sum() == 8          # full line


def test_uncolored_smoke_visible_on_white(tmp_path):
    # regression: with col == bg the composite is identically bg
    # (sum(w*c) + T*bg == 1 when c == bg == 1), so the CLI must default
    # uncolored scenes (smoke/smoke_obs/karman3d npz without Cd) to a
    # gray albedo — the rendered plume must differ from the background.
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from nmcfluid.tools_render_density3d import main

    rho = np.zeros((8, 8, 8), np.float32)
    rho[3:5, 3:5, 3:5] = 5.0
    dens = tmp_path / "density"
    dens.mkdir()
    np.savez_compressed(dens / "density_t001.npz", density=rho,
                        vel=np.zeros(rho.shape + (3,), np.float32))
    main([str(tmp_path), "--frames", "1"])
    img = plt.imread(tmp_path / "render" / "density_t001.png")
    assert img[..., :3].min() < 0.9  # smoke visibly darker than bg
    assert img[..., :3].max() > 0.99  # background still white


def test_deficit_mode_reveals_uniform_dye_wake(tmp_path):
    # karman3d's density IC is uniform dye (|u0| = 0.5 everywhere in
    # fluid, move_density.py 3d:49-117): a straight absorption render is
    # a featureless slab; --deficit renders max(rho)-rho so the wake's
    # dye deficit is the visible structure.
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from nmcfluid.tools_render_density3d import main

    rho = np.full((8, 8, 8), 0.5, np.float32)
    rho[3:5, 3:5, 3:5] = 0.1   # the wake deficit
    dens = tmp_path / "density"
    dens.mkdir()
    np.savez_compressed(dens / "density_t001.npz", density=rho,
                        vel=np.zeros(rho.shape + (3,), np.float32))
    main([str(tmp_path), "--frames", "1"])
    flat = plt.imread(tmp_path / "render" / "density_t001.png")[..., :3]
    main([str(tmp_path), "--frames", "1", "--deficit"])
    dfc = plt.imread(tmp_path / "render" / "density_t001.png")[..., :3]
    # straight render: near-uniform (deficit region barely lighter)
    assert flat.max() - flat.min() < 0.2
    # deficit render: background white, wake visibly dark
    assert dfc.max() > 0.99
    assert dfc.min() < 0.7


def test_every_and_gif_assembly(tmp_path):
    # --every K discovers frames from the density dir; --gif assembles
    # them into an animated gif (stand-in for the reference's plume.mp4)
    from PIL import Image
    from nmcfluid.tools_render_density3d import main

    dens = tmp_path / "density"
    dens.mkdir()
    for t in range(6):
        rho = np.zeros((8, 8, 8), np.float32)
        rho[t + 1, 3:5, 3:5] = 5.0
        np.savez_compressed(dens / f"density_t{t:03d}.npz", density=rho)
    gif = tmp_path / "anim.gif"
    main([str(tmp_path), "--every", "2", "--gif", str(gif)])
    # frames 0, 2, 4 rendered
    assert sorted(p.name for p in (tmp_path / "render").iterdir()) == [
        "density_t000.png", "density_t002.png", "density_t004.png"]
    with Image.open(gif) as im:
        assert im.n_frames == 3
        assert im.size == (8, 8)
