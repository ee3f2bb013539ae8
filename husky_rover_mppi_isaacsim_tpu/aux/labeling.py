"""Synthetic data generation (SDG) — array-native replacement for the
replicator/annotator pipeline of ``src/labeling/`` (auto_label.py:174-239 +
rep_utils.py writers).

The reference records RGB / depth / semantic / instance annotations from
Isaac Sim render products. Without an external renderer, the TPU build
renders its labels directly from the simulation state, all under jit:

* ``hillshade``   — Lambertian sun-lit rendering of the DEM (RGB proxy);
* ``height_map``  — orthographic height (the "depth" modality of a
  top-down orthographic camera);
* ``semantic``    — class ids rasterized from rock/crater footprints;
* ``instance``    — per-rock instance ids;
* ``normals``     — surface normal map.

Writers mirror rep_utils: per-run hashed directories, PNG via PIL + raw
``.npy`` dumps, per-frame pose JSON.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclasses.dataclass
class LabelingConf:
    """auto_label.py AutonomousLabelingConf essentials."""

    num_images: int = 100
    prim_path: str = "/World"
    save_rgb: bool = True
    save_depth: bool = True
    save_semantics: bool = True
    save_instances: bool = False
    save_normals: bool = False
    data_dir: str = "sdg_output"


def surface_normals(z: Array, resolution: float) -> Array:
    """(H, W, 3) unit normals from central differences."""
    dzdx = (jnp.roll(z, -1, 0) - jnp.roll(z, 1, 0)) / (2 * resolution)
    dzdy = (jnp.roll(z, -1, 1) - jnp.roll(z, 1, 1)) / (2 * resolution)
    n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(z)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


@jax.jit
def hillshade(z: Array, resolution: float, sun_direction: Array) -> Array:
    """Lambertian shaded relief of the DEM lit by ``sun_direction`` (3,)
    — the RGB-proxy render product."""
    n = surface_normals(z, resolution)
    sun = sun_direction / jnp.linalg.norm(sun_direction)
    shade = jnp.clip(jnp.einsum("hwc,c->hw", n, sun), 0.0, 1.0)
    return shade


def semantic_mask(
    shape: tuple, resolution: float, origin, rock_xy: np.ndarray,
    rock_radius: np.ndarray, ground_id: int = 1, rock_id: int = 2,
) -> Array:
    """Class-id raster: ground everywhere, rocks stamped as disks
    (the 'ground'/rock semantic labels of the reference pipeline)."""
    h, w = shape
    ox, oy = origin
    rows = jnp.arange(h) * resolution + ox
    cols = jnp.arange(w) * resolution + oy
    seg = jnp.full(shape, ground_id, jnp.int32)
    if len(rock_xy) == 0:
        return seg
    rx = jnp.asarray(rock_xy[:, 0])
    ry = jnp.asarray(rock_xy[:, 1])
    rr = jnp.asarray(rock_radius)
    d2 = (
        (rows[:, None, None] - rx[None, None, :]) ** 2
        + (cols[None, :, None] - ry[None, None, :]) ** 2
    )
    hit = jnp.any(d2 <= (rr[None, None, :] ** 2), axis=-1)
    return jnp.where(hit, rock_id, seg)


def instance_mask(
    shape: tuple, resolution: float, origin, rock_xy: np.ndarray,
    rock_radius: np.ndarray,
) -> Array:
    """Per-rock instance ids (1-based; 0 = background)."""
    h, w = shape
    ox, oy = origin
    rows = jnp.arange(h) * resolution + ox
    cols = jnp.arange(w) * resolution + oy
    if len(rock_xy) == 0:
        return jnp.zeros(shape, jnp.int32)
    rx = jnp.asarray(rock_xy[:, 0])
    ry = jnp.asarray(rock_xy[:, 1])
    rr = jnp.asarray(rock_radius)
    d2 = (
        (rows[:, None, None] - rx[None, None, :]) ** 2
        + (cols[None, :, None] - ry[None, None, :]) ** 2
    )
    inside = d2 <= rr[None, None, :] ** 2
    ids = jnp.arange(1, len(rock_xy) + 1)
    return jnp.max(jnp.where(inside, ids[None, None, :], 0), axis=-1).astype(jnp.int32)


class AutonomousLabeling:
    """Frame recorder (auto_label.py:232-239 ``record`` loop semantics):
    each ``record`` call renders the enabled modalities from the current
    terrain/rocks state and writes them to the hashed run directory."""

    def __init__(self, conf: LabelingConf, render_settings=None):
        self.conf = conf
        # Optional RTX-style post pipeline applied to the RGB modality
        # (startSim applies lens flares / motion blur / chromatic
        # aberrations before SDG runs, environments_wrappers/__init__.py).
        self.render_settings = render_settings
        run_hash = hashlib.sha256(str(time.time()).encode()).hexdigest()[:10]
        self.run_dir = pathlib.Path(conf.data_dir) / run_hash
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.frame = 0

    def record(
        self, z, resolution: float, origin=(0.0, 0.0),
        sun_direction=(0.4, 0.2, 0.9), rock_xy=None, rock_radius=None,
        pose=None,
    ) -> dict:
        """Render + persist one frame; returns the modality dict."""
        z = jnp.asarray(z)
        out = {}
        if self.conf.save_rgb:
            rgb = hillshade(z, resolution, jnp.asarray(sun_direction, z.dtype))
            if self.render_settings is not None:
                from .render_fx import apply_post_fx

                rgb3 = jnp.repeat(rgb[..., None], 3, axis=-1)
                rgb = apply_post_fx(rgb3, self.render_settings)
            out["rgb"] = np.asarray(rgb)
        if self.conf.save_depth:
            out["depth"] = np.asarray(z)
        if self.conf.save_normals:
            out["normals"] = np.asarray(surface_normals(z, resolution))
        rocks = rock_xy if rock_xy is not None else np.zeros((0, 2))
        radii = rock_radius if rock_radius is not None else np.zeros((0,))
        if self.conf.save_semantics:
            out["semantic"] = np.asarray(
                semantic_mask(z.shape, resolution, origin, rocks, radii)
            )
        if self.conf.save_instances:
            out["instance"] = np.asarray(
                instance_mask(z.shape, resolution, origin, rocks, radii)
            )
        self._write(out, pose)
        self.frame += 1
        return out

    def _write(self, modalities: dict, pose) -> None:
        """PNG + npy writers (rep_utils.py:17-476 equivalents)."""
        try:
            from PIL import Image
        except ImportError:
            Image = None
        for name, arr in modalities.items():
            np.save(self.run_dir / f"{name}_{self.frame:05d}.npy", arr)
            if Image is not None and arr.ndim == 2:
                img = arr.astype(np.float64)
                rng_ = img.max() - img.min()
                img8 = ((img - img.min()) / (rng_ + 1e-12) * 255).astype(np.uint8)
                Image.fromarray(img8).save(
                    self.run_dir / f"{name}_{self.frame:05d}.png"
                )
        if pose is not None:
            with open(self.run_dir / f"pose_{self.frame:05d}.json", "w") as fh:
                json.dump({"pose": np.asarray(pose).tolist()}, fh)
