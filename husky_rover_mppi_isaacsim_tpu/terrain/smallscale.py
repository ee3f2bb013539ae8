"""Small-scale (lunalab / lunaryard) procedural terrain.

Re-derivation of ``src/terrain_management/terrain_generation.py`` and the
DEM-facing half of ``terrain_manager.py``:

* :func:`random_base_terrain` — low-frequency (4x4 / masked lab/yard) +
  high-frequency (100x100) uniform noise grids, bicubically upsampled to the
  DEM resolution (terrain_generation.py:456-504; cv2.INTER_CUBIC replaced by
  the framework's Catmull-Rom point sampler — same a=-0.5 kernel family);
* :class:`MoonyardGenerator` — base terrain + hardcore-Poisson craters
  stamped with the shared crater renderer (``GenerateProceduralMoonYard``,
  :505-590) + rock-costmap hooks;
* :func:`dem_to_mesh_grid` — vertices/triangles of the two-triangles-per-
  pixel grid the reference meshes into USD (terrain_manager.py:151-193) —
  exported as arrays for downstream visualization instead of a USD stage.

The per-frame randomization path (SDG mode) is jit-friendly: fixed shapes,
key-driven.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .craters import (
    CraterProfiles,
    CraterSamplerConf,
    build_profiles,
    randomize_metadata,
    render_crater_block,
)
from .point_process import BoundingBox, hardcore_poisson
from .upsample import bicubic_point_sample


@dataclasses.dataclass
class BaseTerrainGeneratorConf:
    """terrain_generation.py BaseTerrainGeneratorConf."""

    x_size: float = 10.0
    y_size: float = 10.0
    resolution: float = 0.02
    max_elevation: float = 0.5
    min_elevation: float = -0.25
    seed: int = 42
    z_scale: float = 1.0


def _resize_bicubic(img: Array, out_shape: tuple) -> Array:
    """cv2.INTER_CUBIC-style resize via Catmull-Rom point sampling at the
    pixel-center mapping ``src = (dst + 0.5) * scale - 0.5``."""
    h_in, w_in = img.shape
    h_out, w_out = out_shape
    rows = (jnp.arange(h_out) + 0.5) * (h_in / h_out) - 0.5
    cols = (jnp.arange(w_out) + 0.5) * (w_in / w_out) - 0.5
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    return bicubic_point_sample(img, rr, cc)


def random_base_terrain(
    key: Array, conf: BaseTerrainGeneratorConf,
    is_lab: bool = False, is_yard: bool = False,
) -> Array:
    """Low+high-frequency noise terrain (generateRandomTerrain,
    terrain_generation.py:475-504), fully on device."""
    x_px = int(conf.x_size / conf.resolution)
    y_px = int(conf.y_size / conf.resolution)
    k1, k2 = jax.random.split(key)
    if is_lab:
        lr = jnp.zeros((4, 4))
        lr = lr.at[:-1, 1:].set(
            jax.random.uniform(k1, (3, 3), minval=conf.min_elevation,
                               maxval=conf.max_elevation)
        )
    elif is_yard:
        lr = jnp.zeros((7, 7))
        lr = lr.at[1:-1, 1:-1].set(
            jax.random.uniform(k1, (5, 5), minval=conf.min_elevation,
                               maxval=conf.max_elevation)
        )
    else:
        lr = jax.random.uniform(k1, (4, 4), minval=conf.min_elevation,
                                maxval=conf.max_elevation)
    dem = _resize_bicubic(lr, (x_px, y_px))
    hr = jax.random.uniform(
        k2, (100, 100), minval=conf.min_elevation * 0.01,
        maxval=conf.max_elevation * 0.01,
    )
    return dem + _resize_bicubic(hr, (x_px, y_px))


@dataclasses.dataclass
class MoonyardConf:
    base: BaseTerrainGeneratorConf = dataclasses.field(
        default_factory=BaseTerrainGeneratorConf
    )
    crater: CraterSamplerConf = dataclasses.field(
        default_factory=lambda: CraterSamplerConf(
            densities=(0.1,), radius_ranges=((0.3, 1.0),), num_profiles=32,
        )
    )
    is_lab: bool = False
    is_yard: bool = True
    z_scale: float = 1.0


class MoonyardGenerator:
    """GenerateProceduralMoonYard (terrain_generation.py:505-590): base noise
    + hardcore-Poisson craters; ``randomize`` returns a fresh DEM."""

    def __init__(self, conf: MoonyardConf):
        self.conf = conf
        self.rng = np.random.default_rng(conf.base.seed)
        self.key = jax.random.key(conf.base.seed)
        self.profiles: CraterProfiles = build_profiles(
            conf.crater.num_profiles, conf.crater.seed
        )
        self.x_px = int(conf.base.x_size / conf.base.resolution)
        self.y_px = int(conf.base.y_size / conf.base.resolution)
        r_max = max(hi for _, hi in conf.crater.radius_ranges)
        p = int(np.ceil(2 * r_max / conf.base.resolution)) + 4
        self._patch_px = -(-p // 8) * 8
        area = conf.base.x_size * conf.base.y_size
        cap = int(area * sum(conf.crater.densities) * 1.5) + 64
        self._capacity = -(-cap // 256) * 256

    def randomize(self) -> Array:
        """New base terrain + crater field (randomize,
        terrain_generation.py:546-558)."""
        self.key, k = jax.random.split(self.key)
        dem = random_base_terrain(
            k, self.conf.base, self.conf.is_lab, self.conf.is_yard
        )
        cc = self.conf.crater
        region = BoundingBox(0.0, self.conf.base.x_size, 0.0, self.conf.base.y_size)
        coords, radius = hardcore_poisson(
            self.rng, region, cc.densities, cc.radius_ranges, None,
            cc.num_repeat,
        )
        if coords.shape[0] > self._capacity:
            coords, radius = coords[: self._capacity], radius[: self._capacity]
        field = randomize_metadata(
            self.rng, coords, radius, cc.num_profiles, self._capacity,
            cc.min_xy_ratio, cc.max_xy_ratio,
        )
        # render over the whole yard as a single "block" with zero padding;
        # the block renderer is square, so render the enclosing square and
        # crop to the yard shape (non-square labs, e.g. 9.6 x 6.4 m lunalab)
        side = max(self.x_px, self.y_px)
        craters = render_crater_block(
            self.profiles, field, jnp.asarray([0.0, 0.0], jnp.float32),
            self.conf.base.resolution, self.conf.z_scale,
            block_px=side, pad_px=0, patch_px=self._patch_px,
        )
        return dem + craters[: dem.shape[0], : dem.shape[1]]


def thesis_statistics_terrain(
    seed: int = 42,
    size_m: float = 150.0,
    resolution: float = 0.1,
    crater_densities: tuple = (0.02, 0.05, 0.13),
    crater_radius_ranges: tuple = ((1.5, 2.5), (0.75, 1.5), (0.25, 0.5)),
    max_elevation: float = 1.2,
    min_elevation: float = -1.2,
    z_scale: float = 1.0,
) -> Array:
    """Terrain statistically matched to the thesis's NASA-DEM test map
    (``thesis_master/work summarise:47-49``): 150 x 150 m at 0.1 m/px with
    gentle bumps and craters at a total density of 1/5 m^2 (the tier
    densities above sum to 0.2 craters/m^2). The actual ``test_nathan.npy``
    DEM is LFS-stripped from the reference snapshot, so the 2D-vs-3D
    statistics experiment regenerates an equivalent surface: low-frequency
    base undulation (bumps) + hardcore-Poisson crater tiers rendered with
    the shared crater stamper. Returns heights ``(N, N)``, row = x."""
    conf = MoonyardConf(
        base=BaseTerrainGeneratorConf(
            x_size=size_m, y_size=size_m, resolution=resolution,
            max_elevation=max_elevation, min_elevation=min_elevation,
            seed=seed,
        ),
        crater=CraterSamplerConf(
            densities=crater_densities,
            radius_ranges=crater_radius_ranges,
            num_profiles=64,
            seed=seed,
        ),
        is_lab=False,
        is_yard=False,
        z_scale=z_scale,
    )
    return MoonyardGenerator(conf).randomize()


def dem_to_mesh_grid(dem: np.ndarray, resolution: float):
    """Vertices (N, 3) + triangle indices (M, 3) of the regular grid mesh —
    two triangles per pixel (buildGrid, terrain_manager.py:151-193)."""
    h, w = dem.shape
    xx, yy = np.meshgrid(
        np.arange(h) * resolution, np.arange(w) * resolution, indexing="ij"
    )
    vertices = np.stack([xx.ravel(), yy.ravel(), np.asarray(dem).ravel()], axis=-1)
    idx = np.arange(h * w).reshape(h, w)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    tris = np.concatenate(
        [np.stack([a, b, c], axis=-1), np.stack([b, d, c], axis=-1)], axis=0
    )
    return vertices, tris
