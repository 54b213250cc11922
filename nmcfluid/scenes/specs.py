"""Scene specifications for every example shipped with the reference.

Each SceneSpec bundles what the reference scatters across run.sh flags
(examples/*/run.sh), wost.json (solver/scene/output blocks), sources.py
(initial velocity), main.py (bbox + obstacle extraction from the boundary
OBJ) and base.py (hard BCs, handled in nmcfluid.models.boundary).

Boundary geometry is generated procedurally at the dimensions measured from
the reference assets — no OBJ files are copied:
  * taylorgreen: 40-segment square [~0, 2pi]^2 (examples/taylorgreen/square.obj)
  * karman: open channel x in [-1.10321, 1.906778], y in [-0.598466,
    0.60349] — top/bottom walls only (inlet/outlet open, 20 segs each) + a
    40-segment circle obstacle at (-0.803568, -0.005022), r = 0.044532
    (examples/karman/geometry_1cyl_long_open.obj; endpoints verified open)
  * jpipe: J-shaped duct (no shipped example dir, supported by src/2d)
  * 3D scenes: 12-triangle cube [-1, 1]^3 (examples/*/cube.obj)

The solver block is identical in every shipped wost.json: nWalks 500,
maxWalkLength 10000, epsilonShell/minStarShapedRadius 1e-3, RR 0.99,
Tikhonov from step 0, absorptionCoeff 350, boundaryDistanceMask 1e-3.
"""
import dataclasses
from functools import cached_property
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sdf
from ..geometry.analytic2d import make_analytic2d, FAR
from ..geometry.analytic3d import make_box3d
from ..geometry.soup2d import (Seg2D, build_segments, box_loop,
                               circle_loop_cw, polyline_chain)
from ..geometry.soup3d import Tri3D, box_tris, build_triangles
from ..wost.solver import WalkSettings

# measured from examples/karman/geometry_1cyl_long_open.obj
KARMAN_BBOX = (-1.10321, 1.906778, -0.598466, 0.60349)
KARMAN_OBS_C = (-0.803568, -0.005022)
KARMAN_OBS_R = 0.044532
TG_LO, TG_HI = 0.000447, 6.279553   # examples/taylorgreen/square.obj


@dataclasses.dataclass(frozen=True, eq=False)   # id-hash: stable jit keys
class SceneSpec:
    name: str
    dim: int
    scene_size: Tuple[float, ...]       # (xmin,xmax,ymin,ymax[,zmin,zmax])
    # training hyperparameters (examples/*/run.sh)
    num_hidden_layers: int
    hidden_features: int
    dt: float
    n_timesteps: int
    sample_resolution: int
    wost_resolution: int
    vis_resolution: int
    vel_vis_resolution: int
    bdry_eps: float
    lr: float = 1e-5
    max_n_iters: int = 10_000
    early_stop_loss: float = 1.1e-10    # base.py:148
    reset_wts: bool = True
    karman_vel: float = 0.5
    src_duration: int = 1               # config.py --src_duration default
    nonlinearity: str = "sine"
    sample_pattern: str = "random"      # config.py --sample (all examples)
    # WoSt block (wost.json; identical across shipped examples)
    absorption: float = 350.0
    n_walks: int = 500
    boundary_distance_mask: float = 1e-3
    # geometry hooks
    obstacle_center: Optional[Tuple[float, ...]] = None
    obstacle_radius: Optional[float] = None
    # multi-obstacle scenes (round 5): tuple of (cx, cy, r) circle
    # obstacles — the reference ships 2- and 3-cylinder karman
    # geometries (src/3d/wost/geometry_2cyl.obj, geometry_3cyl.obj)
    # whose driver extracts interior loops generically (main.py:36-59)
    obstacles: Optional[Tuple[Tuple[float, float, float], ...]] = None
    # "y" marks an infinite axis-aligned cylinder: obstacle_center is
    # then the (x, z) in-plane center (karman3d; ops/cylinder_modes.py)
    obstacle_axis: Optional[str] = None
    _boundary_builder: Optional[Callable] = None
    _obstacle_sdf_builder: Optional[Callable] = None
    _source_builder: Optional[Callable] = None

    @cached_property
    def boundary(self):
        """Neumann boundary soup (Seg2D / Tri3D) for the WoSt solve."""
        return self._boundary_builder(self)

    @cached_property
    def obstacle_sdf(self):
        """sdf > 0 in fluid, or None. The karman radius includes
        boundaryDistanceMask (src/2d/main.py:96)."""
        if self._obstacle_sdf_builder is None:
            return None
        return self._obstacle_sdf_builder(self)

    @property
    def has_obstacle(self):
        return self._obstacle_sdf_builder is not None

    def source_velocity(self, x, key=None):
        """Initial / inflow velocity at points x (src/{2d,3d}/sources.py)."""
        return self._source_builder(self, x, key)

    def walk_settings(self, **over):
        kw = dict(n_walks=self.n_walks)
        kw.update(over)
        return WalkSettings(**kw)

    def fluid_mask(self, x):
        """True where x is in the trainable fluid region (the reference's
        rejection filters in sample_in_training, base.py:239-249)."""
        m = jnp.ones(x.shape[:-1], bool)
        if self.name == "jpipe":
            return sdf.jpipe_interior_mask()(x)
        if self.obstacle_sdf is not None:
            m = m & (self.obstacle_sdf(x) > 0.0)
        return m


# ------------------------------------------------------------------ sources

def _tg_source(spec, x, key):
    """Taylor-Green initial velocity, rescaled from the scene box to
    (0, 2pi)^2 (src/2d/sources.py:19-31)."""
    ss = spec.scene_size
    sx = (x[..., 0] - ss[0]) / (ss[1] - ss[0]) * 2.0 * jnp.pi
    sy = (x[..., 1] - ss[2]) / (ss[3] - ss[2]) * 2.0 * jnp.pi
    u = jnp.sin(sx) * jnp.cos(sy)
    v = -jnp.cos(sx) * jnp.sin(sy)
    return jnp.stack([u, v], axis=-1)


def _karman_source(spec, x, key):
    """Uniform inflow ramped off the obstacle (src/2d/sources.py:33-42)."""
    vel = jnp.stack([jnp.full(x.shape[:-1], spec.karman_vel),
                     jnp.zeros(x.shape[:-1])], axis=-1)
    w = jnp.clip(spec.obstacle_sdf(x), 0.0, spec.bdry_eps) / spec.bdry_eps
    return vel * w[..., None]


def _jpipe_source(spec, x, key):
    """src/2d/sources.py:44-66."""
    u = jnp.where(x[..., 0] < 1.4, spec.karman_vel, 0.0)
    vel = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
    w = jnp.clip(sdf.jpipe_walls()(x), 0.0, spec.bdry_eps) / spec.bdry_eps
    vel = vel * w[..., None]
    return jnp.where(sdf.jpipe_interior_mask()(x)[..., None], vel, 0.0)


def _smoke_source(spec, x, key):
    """Jet sphere at (0,0,-0.6), r=0.11, w ~ 0.2 + jitter
    (src/3d/sources.py:22-49). The reference draws numpy jitter with no fixed
    seed; here one uniform per point from `key`."""
    center = jnp.asarray([0.0, 0.0, -0.6], jnp.float32)
    mask = jnp.linalg.norm(x - center, axis=-1) < 0.11
    k = key if key is not None else jax.random.PRNGKey(0)
    r = 10.0 * (2.0 * jax.random.uniform(k, x.shape[:-1]) - 1.0)
    jet = jnp.stack([0.01 * r, 0.01 * r, 0.2 + 0.01 * r], axis=-1)
    return jnp.where(mask[..., None], jet, 0.0)


def _smoke_obs_source(spec, x, key):
    """src/3d/sources.py:51-68: w = 1 inside the jet sphere."""
    center = jnp.asarray([0.0, 0.0, -0.6], jnp.float32)
    mask = jnp.linalg.norm(x - center, axis=-1) < 0.11
    w = jnp.where(mask, 1.0, 0.0)
    return jnp.stack([jnp.zeros_like(w), jnp.zeros_like(w), w], axis=-1)


def _vortex_collide_source(spec, x, key):
    """Two opposed jets with a cos(8 theta) azimuthal perturbation
    (src/3d/sources.py:70-93). The reference normalizes `dir` over the batch
    axis (axis=0) — a slip; the intent (per-sample direction angle) is
    implemented here, with theta measured around (0.2, 0.2)."""
    def ring(center, sign, cx=0.2, cy=0.2):
        c = jnp.asarray(center, jnp.float32)
        mask = jnp.linalg.norm(x - c, axis=-1) < 0.2
        d = jnp.stack([x[..., 0] - cx, x[..., 1] - cy], axis=-1)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        theta = jnp.arccos(jnp.clip(d[..., 0], -1.0, 1.0))
        w = sign * 0.2 * (1.0 + 0.01 * jnp.cos(8.0 * theta))
        return jnp.where(mask, w, 0.0)
    w = ring([0.0, 0.0, -0.21], 1.0) + ring([0.0, 0.0, 0.21], -1.0,
                                            cx=0.201, cy=0.2)
    z = jnp.zeros_like(w)
    return jnp.stack([z, z, w], axis=-1)


def _karman3d_source(spec, x, key):
    """src/3d/sources.py:95-104: uniform +z inflow ramped off the cylinder."""
    w = jnp.full(x.shape[:-1], spec.karman_vel)
    ramp = jnp.clip(spec.obstacle_sdf(x), 0.0, spec.bdry_eps) / spec.bdry_eps
    z = jnp.zeros_like(w)
    return jnp.stack([z, z, w * ramp], axis=-1)


# ----------------------------------------------------------------- geometry

def _tg_boundary(spec):
    """Closed square box — analytic closed-form queries (O(1) per walk
    step instead of a 40-segment reduction)."""
    return make_analytic2d((TG_LO, TG_LO), (TG_HI, TG_HI))


def _tg_boundary_soup(spec) -> Seg2D:
    """Segment-soup variant of the TG box (the reference's 40-segment
    square.obj); kept for analytic-vs-soup equivalence tests."""
    return build_segments([box_loop(TG_LO, TG_HI, TG_LO, TG_HI,
                                    n_per_side=10)])


def _karman_boundary(spec):
    """Open channel (y walls only; inlet/outlet open) + exact circle
    obstacle; the wall-chain corner endpoints are always-silhouette points
    like the reference asset's open-chain endpoints."""
    x0, x1, y0, y1 = KARMAN_BBOX
    corners = [(x0, y0), (x1, y0), (x0, y1), (x1, y1)]
    return make_analytic2d((-FAR, y0), (FAR, y1),
                           circles=[(*KARMAN_OBS_C, KARMAN_OBS_R)],
                           sil_pts=corners,
                           bbox=((x0, y0), (x1, y1)))


def _karman_boundary_soup(spec) -> Seg2D:
    """The reference asset's topology: two open 20-segment wall chains +
    a clockwise 40-gon circle; normals out of the fluid."""
    x0, x1, y0, y1 = KARMAN_BBOX
    xs = np.linspace(x0, x1, 21)
    bottom = polyline_chain(np.stack([xs, np.full_like(xs, y0)], 1)[::-1])
    top = polyline_chain(np.stack([xs, np.full_like(xs, y1)], 1))
    circ = circle_loop_cw(KARMAN_OBS_C, KARMAN_OBS_R, n=40)
    return build_segments([bottom, top, circ])


def _jpipe_boundary(spec) -> Seg2D:
    """J-pipe walls: inner and outer offset curves of the duct, open at the
    inlet (x=0) and outlet (y=2). Fluid between the curves."""
    th = np.linspace(0.0, 0.5 * np.pi, 21)
    # outer wall: y=0 run, outer elbow r=1 around (1,1), x=2 run; fluid left
    outer = ([(0.0, 0.0)]
             + [(1.0 + np.sin(t), 1.0 - np.cos(t)) for t in th]
             + [(2.0, 2.0)])
    # inner wall: y=0.5 run, inner elbow r=0.5, x=1.5 run; fluid right
    inner = ([(0.0, 0.5)]
             + [(1.0 + 0.5 * np.sin(t), 1.0 - 0.5 * np.cos(t)) for t in th]
             + [(1.5, 2.0)])
    return build_segments([polyline_chain(np.asarray(outer)),
                           polyline_chain(np.asarray(inner)[::-1])])


def _cube_boundary(spec):
    """Closed cube — analytic slab queries, no silhouettes."""
    return make_box3d((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def _cube_boundary_soup(spec) -> Tri3D:
    """12-triangle soup variant (the reference's cube.obj) for tests."""
    v, f = box_tris((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    return build_triangles(v, f)


def _karman_sdf(spec):
    return sdf.circle(KARMAN_OBS_C,
                      KARMAN_OBS_R + spec.boundary_distance_mask)


# ---- multi-cylinder karman family (src/3d/wost/geometry_2cyl.obj /
# geometry_3cyl.obj measured loops; the reference driver extracts
# interior obstacle loops generically, src/2d/main.py:36-59). Dims below
# are MEASURED from the reference assets — no OBJ files are copied.
NCYL_BBOX = (-1.995, 1.9942, -0.995, 0.9942)
CYL2_OBS = ((-1.0004, -0.0004, 0.1310), (-0.0004, -0.0004, 0.1312))
CYL3_OBS = ((-1.0004, -0.0004, 0.1310), (-0.0004, 0.1496, 0.1310),
            (-0.0004, -0.1504, 0.1310))


def _ncyl_boundary(spec):
    """Open channel + one exact circle per spec.obstacles entry."""
    x0, x1, y0, y1 = spec.scene_size
    corners = [(x0, y0), (x1, y0), (x0, y1), (x1, y1)]
    return make_analytic2d((-FAR, y0), (FAR, y1),
                           circles=list(spec.obstacles),
                           sil_pts=corners,
                           bbox=((x0, y0), (x1, y1)))


def _ncyl_sdf(spec):
    """min over circle SDFs, each grown by boundaryDistanceMask
    (the reference grows its fitted circle the same way, main.py:96)."""
    fns = [sdf.circle((cx, cy), r + spec.boundary_distance_mask)
           for cx, cy, r in spec.obstacles]

    def f(x):
        d = fns[0](x)
        for g in fns[1:]:
            d = jnp.minimum(d, g(x))
        return d
    return f


def _jpipe_sdf(spec):
    return sdf.jpipe_walls()


def _smoke_obs_sdf(spec):
    return sdf.sphere([0.0, 0.0, -0.3], 0.1)     # src/3d/main.py:87-89


def _karman3d_sdf(spec):
    return sdf.cylinder_xz([0.0, -0.8], 0.1)     # src/3d/main.py:92-94


# ------------------------------------------------------------------ catalog

_CUBE = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)

SCENES = {
    # examples/taylorgreen/run.sh
    "taylorgreen": SceneSpec(
        name="taylorgreen", dim=2,
        scene_size=(TG_LO, TG_HI, TG_LO, TG_HI),
        num_hidden_layers=6, hidden_features=64, dt=0.001, n_timesteps=100,
        sample_resolution=64, wost_resolution=512, vis_resolution=1000,
        vel_vis_resolution=60, bdry_eps=1e-3, reset_wts=False,
        _boundary_builder=_tg_boundary, _source_builder=_tg_source),
    # examples/karman/run.sh (bdry_eps halved after init, main.py:161-163)
    "karman": SceneSpec(
        name="karman", dim=2, scene_size=KARMAN_BBOX,
        num_hidden_layers=2, hidden_features=128, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=512, vis_resolution=1000,
        vel_vis_resolution=200, bdry_eps=3e-2, karman_vel=0.5,
        obstacle_center=KARMAN_OBS_C, obstacle_radius=KARMAN_OBS_R,
        _boundary_builder=_karman_boundary, _source_builder=_karman_source,
        _obstacle_sdf_builder=_karman_sdf),
    # reference 2-/3-cylinder karman geometries (src/3d/wost/
    # geometry_2cyl.obj, geometry_3cyl.obj, measured dims); hyperparams
    # as karman, dt scaled with the ~1.3x longer channel
    "karman2cyl": SceneSpec(
        name="karman2cyl", dim=2, scene_size=NCYL_BBOX,
        num_hidden_layers=2, hidden_features=128, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=512, vis_resolution=1000,
        vel_vis_resolution=200, bdry_eps=3e-2, karman_vel=0.5,
        obstacles=CYL2_OBS,
        _boundary_builder=_ncyl_boundary, _source_builder=_karman_source,
        _obstacle_sdf_builder=_ncyl_sdf),
    "karman3cyl": SceneSpec(
        name="karman3cyl", dim=2, scene_size=NCYL_BBOX,
        num_hidden_layers=2, hidden_features=128, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=512, vis_resolution=1000,
        vel_vis_resolution=200, bdry_eps=3e-2, karman_vel=0.5,
        obstacles=CYL3_OBS,
        _boundary_builder=_ncyl_boundary, _source_builder=_karman_source,
        _obstacle_sdf_builder=_ncyl_sdf),
    # supported by src/2d (no shipped example dir); hyperparams as karman
    "jpipe": SceneSpec(
        name="jpipe", dim=2, scene_size=(0.0, 2.0, 0.0, 2.0),
        num_hidden_layers=2, hidden_features=128, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=512, vis_resolution=1000,
        vel_vis_resolution=200, bdry_eps=3e-2, karman_vel=0.5,
        _boundary_builder=_jpipe_boundary, _source_builder=_jpipe_source,
        _obstacle_sdf_builder=_jpipe_sdf),
    # examples/smoke3d/run.sh
    "smoke": SceneSpec(
        name="smoke", dim=3, scene_size=_CUBE,
        num_hidden_layers=5, hidden_features=64, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=256, vis_resolution=80,
        vel_vis_resolution=100, bdry_eps=1e-2,
        _boundary_builder=_cube_boundary, _source_builder=_smoke_source),
    # examples/smoke_obs/run.sh
    "smoke_obs": SceneSpec(
        name="smoke_obs", dim=3, scene_size=_CUBE,
        num_hidden_layers=5, hidden_features=64, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=256, vis_resolution=80,
        vel_vis_resolution=100, bdry_eps=1e-2,
        obstacle_center=(0.0, 0.0, -0.3), obstacle_radius=0.1,
        _boundary_builder=_cube_boundary, _source_builder=_smoke_obs_source,
        _obstacle_sdf_builder=_smoke_obs_sdf),
    # examples/vortex_collide/run.sh
    "vortex_collide": SceneSpec(
        name="vortex_collide", dim=3, scene_size=_CUBE,
        num_hidden_layers=5, hidden_features=64, dt=0.05, n_timesteps=200,
        sample_resolution=128, wost_resolution=256, vis_resolution=80,
        vel_vis_resolution=100, bdry_eps=1e-2,
        _boundary_builder=_cube_boundary,
        _source_builder=_vortex_collide_source),
    # examples/karman3d/run.sh
    "karman3d": SceneSpec(
        name="karman3d", dim=3, scene_size=_CUBE,
        num_hidden_layers=2, hidden_features=128, dt=0.05, n_timesteps=500,
        sample_resolution=128, wost_resolution=256, vis_resolution=80,
        vel_vis_resolution=100, bdry_eps=1e-2, karman_vel=0.5,
        obstacle_center=(0.0, -0.8), obstacle_radius=0.1,
        obstacle_axis="y",
        _boundary_builder=_cube_boundary, _source_builder=_karman3d_source,
        _obstacle_sdf_builder=_karman3d_sdf),
}


def get_scene(name: str) -> SceneSpec:
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; have {sorted(SCENES)}")
    return SCENES[name]
