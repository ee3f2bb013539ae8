"""Procedural crater generation — TPU-native re-design of
``src/terrain_management/large_scale_terrain/crater_generation.py`` and the
metadata half of ``crater_distribution.py``.

Differences from the reference, by design:

* Spline profiles (deformation / marks / half-crater) are baked once into
  **dense lookup tables** evaluated with vectorized linear interpolation —
  cubic-spline evaluation and ``scipy.ndimage.rotate`` don't belong in a TPU
  kernel. Rotation is applied analytically (coordinates rotated before the
  distance computation) instead of resampling the rendered image, which is
  alias-free and exactly equivalent up to the reference's interpolation error.
* The per-crater ``sat_gaussian`` min-max normalization
  (crater_generation.py:106-118) is replaced by its analytic limit
  (division by the in-band maximum 1/(std*sqrt(2*pi)); the patch minimum is
  exp(-60) ~ 0), error < 1e-25.
* The reference's half-profile pickle (assets/Terrains/
  crater_spline_profiles.pkl) is LFS-stripped and absent, so a deterministic
  synthetic family of lunar crater half-profiles (parabolic bowl + raised rim
  + decaying ejecta, profile(1) = 0) replaces it.
* Whole blocks render as one jitted scan over a fixed crater capacity:
  stamping becomes a masked accumulate over the block raster instead of
  variable-size NumPy patch writes in worker processes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

TABLE_SIZE = 256


class CraterProfiles(NamedTuple):
    """Baked profile tables, all ``(num_profiles, TABLE_SIZE)``."""

    deformation: Array  # angular deformation factor over theta in [0, 1)
    marks: Array        # angular marks amplitude over theta in [0, 1)
    height: Array       # radial half-profile over r/R in [0, 1]


class CraterField(NamedTuple):
    """Struct-of-arrays crater metadata (utils.py:89-97 CraterMetadata),
    padded to a fixed capacity with ``mask``."""

    coordinates: Array          # (C, 2) meters
    radius: Array               # (C,)
    deformation_id: Array       # (C,) int32
    marks_id: Array             # (C,) int32
    marks_intensity: Array      # (C,)
    profile_id: Array           # (C,) int32
    xy_factor: Array            # (C,) x deformation factor (y factor is 1)
    rotation: Array             # (C,) degrees
    mask: Array                 # (C,) bool


def _closed_spline_table(rng: np.random.Generator, low: float, high: float,
                         num_knots: int) -> np.ndarray:
    """Periodic-ish cubic spline through U(low, high) knots with clamped end
    slopes (crater_distribution.py:386-409), baked to a dense table."""
    from scipy.interpolate import CubicSpline

    knots = rng.uniform(low, high, num_knots)
    knots = np.concatenate([knots, [knots[0]]])
    x = np.linspace(0, 1, knots.shape[0])
    spline = CubicSpline(x, knots, bc_type=((1, 0.0), (1, 0.0)))
    return spline(np.linspace(0, 1, TABLE_SIZE))


def _synthetic_half_profile(rng: np.random.Generator) -> np.ndarray:
    """Deterministic synthetic lunar crater half-profile h(r/R) in units of
    the radius: parabolic bowl, raised rim, exponentially decaying ejecta,
    h(1) = 0 (replacement for the missing profile pickle)."""
    x = np.linspace(0, 1, TABLE_SIZE)
    depth = rng.uniform(0.15, 0.35)
    rim_height = rng.uniform(0.02, 0.08)
    rim_pos = rng.uniform(0.55, 0.75)
    decay = rng.uniform(8.0, 16.0)
    bowl = -depth + (depth + rim_height) * (x / rim_pos) ** 2
    tail_len = max(1.0 - rim_pos, 1e-6)
    frac = (x - rim_pos) / tail_len
    taper = np.exp(-decay * frac) - np.exp(-decay)
    taper /= 1.0 - np.exp(-decay)
    ejecta = rim_height * taper
    h = np.where(x <= rim_pos, bowl, ejecta)
    # gentle smoothing of the rim kink
    kernel = np.array([0.25, 0.5, 0.25])
    h = np.convolve(np.pad(h, 1, mode="edge"), kernel, mode="valid")
    h[-1] = 0.0
    return h


def build_profiles(num_profiles: int = 100, seed: int = 42,
                   dtype=jnp.float32) -> CraterProfiles:
    """Bake the three profile families (CraterMetadataGenerator.build,
    crater_distribution.py:341-396)."""
    rng = np.random.default_rng(seed)
    deform = np.stack(
        [_closed_spline_table(rng, 0.95, 1.0, 9) for _ in range(num_profiles)]
    )
    marks = np.stack(
        [_closed_spline_table(rng, 0.0, 0.01, 45) for _ in range(num_profiles)]
    )
    height = np.stack([_synthetic_half_profile(rng) for _ in range(num_profiles)])
    return CraterProfiles(
        jnp.asarray(deform, dtype), jnp.asarray(marks, dtype),
        jnp.asarray(height, dtype),
    )


def randomize_metadata(
    rng: np.random.Generator,
    coordinates: np.ndarray,
    radius: np.ndarray,
    num_profiles: int,
    capacity: int,
    min_xy_ratio: float = 0.85,
    max_xy_ratio: float = 1.0,
    dtype=np.float32,
    as_numpy: bool = False,
) -> CraterField:
    """Host metadata randomization mirroring the reference's per-crater draw
    order (crater_distribution.py:427-451: deformation id, marks id,
    intensity, profile id, xy ratio, rotation). ``as_numpy`` keeps the field
    on host (the streamer splits it into radius tiers before upload)."""
    n = coordinates.shape[0]
    assert n <= capacity, (n, capacity)
    field = CraterField(
        coordinates=np.zeros((capacity, 2), dtype),
        radius=np.zeros((capacity,), dtype),
        deformation_id=np.zeros((capacity,), np.int32),
        marks_id=np.zeros((capacity,), np.int32),
        marks_intensity=np.zeros((capacity,), dtype),
        profile_id=np.zeros((capacity,), np.int32),
        xy_factor=np.ones((capacity,), dtype),
        rotation=np.zeros((capacity,), dtype),
        mask=np.zeros((capacity,), bool),
    )
    # vectorized draws (per-attribute arrays rather than the reference's
    # per-crater sequential calls — same distributions, different stream)
    field.coordinates[:n] = coordinates
    field.radius[:n] = radius
    field.deformation_id[:n] = rng.integers(0, num_profiles, n)
    field.marks_id[:n] = rng.integers(0, num_profiles, n)
    field.marks_intensity[:n] = rng.uniform(0, 1, n)
    field.profile_id[:n] = rng.integers(0, num_profiles, n)
    field.xy_factor[:n] = rng.uniform(min_xy_ratio, max_xy_ratio, n)
    field.rotation[:n] = rng.uniform(0, 360, n).astype(np.int64)
    field.mask[:n] = True
    if as_numpy:
        return field
    return CraterField(*[jnp.asarray(f) for f in field])


def _table_lookup(table: Array, ids: Array, x: Array) -> Array:
    """Linear interpolation into per-crater rows of a baked table.
    ``ids``: (C,) profile row per crater; ``x``: (C, ...) in [0, 1]."""
    pos = jnp.clip(x, 0.0, 1.0) * (TABLE_SIZE - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, TABLE_SIZE - 1)
    frac = pos - i0
    rows = table[ids]  # (C, TABLE_SIZE)
    v0 = jax.vmap(lambda r, i: r[i])(rows, i0)
    v1 = jax.vmap(lambda r, i: r[i])(rows, i1)
    return v0 * (1.0 - frac) + v1 * frac


def _render_patches(
    profiles: CraterProfiles, field: CraterField, resolution: float,
    z_scale: float, patch_px: int,
) -> Array:
    """Render every crater into its own ``(patch_px, patch_px)`` patch
    centered on the crater (vectorized over the crater axis). The per-pixel
    math mirrors ``CraterBuilder.centered_distance_matrix`` +
    ``apply_profile`` (crater_generation.py:77-167) with the analytic
    substitutions documented in the module docstring."""
    rows = jnp.arange(patch_px, dtype=jnp.float32) - patch_px // 2
    u = rows[None, :, None]  # (1, P, 1) x offset in px
    v = rows[None, None, :]  # (1, 1, P) y offset in px

    half_px = jnp.floor(field.radius / resolution)[:, None, None]
    ang = jnp.deg2rad(field.rotation)[:, None, None]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    ur = ca * u + sa * v
    vr = -sa * u + ca * v

    inside_square = jnp.maximum(jnp.abs(u), jnp.abs(v)) <= half_px
    inside_rot = jnp.maximum(jnp.abs(ur), jnp.abs(vr)) <= half_px

    theta = jnp.arctan2(ur, vr) / (2.0 * jnp.pi) + 0.5
    fac = _table_lookup(profiles.deformation, field.deformation_id, theta)
    marks = (
        _table_lookup(profiles.marks, field.marks_id, theta)
        * half_px
        * field.marks_intensity[:, None, None]
    )

    m = jnp.sqrt((vr / field.xy_factor[:, None, None]) ** 2 + ur**2) * fac

    # saturated-gaussian marks envelope (analytic normalization)
    mu1, mu2, std = 0.15 * half_px, 0.45 * half_px, 0.05 * half_px
    std = jnp.maximum(std, 1e-6)
    sat = jnp.where(
        m < mu1,
        jnp.exp(-0.5 * ((m - mu1) / std) ** 2),
        jnp.where(m > mu2, jnp.exp(-0.5 * ((m - mu2) / std) ** 2), 1.0),
    )
    m = m + marks * sat
    m = jnp.where(inside_rot, m, half_px)
    m = jnp.minimum(m, half_px)

    h = (
        _table_lookup(profiles.height, field.profile_id,
                      m / jnp.maximum(half_px, 1.0))
        * field.radius[:, None, None]
        * z_scale
    )
    return jnp.where(inside_square & field.mask[:, None, None], h, 0.0)


@functools.partial(
    jax.jit, static_argnames=("block_px", "pad_px", "patch_px", "chunk")
)
def render_crater_block(
    profiles: CraterProfiles,
    field: CraterField,
    block_origin: Array,
    resolution: float,
    z_scale: float,
    block_px: int,
    pad_px: int,
    patch_px: int = 128,
    chunk: int = 256,
) -> Array:
    """Render all craters of a field into one block raster
    (CraterBuilder.generate_craters, crater_generation.py:182-221).

    TPU shape: craters render as fixed-size patches in ``chunk``-sized
    batches (dense vectorized math) and scatter-add into the padded raster —
    the device equivalent of the reference's variable-size patch writes.
    Craters whose patch leaves the padded raster must be pre-filtered (the
    reference's ``check_if_crater_is_in_block``); out-of-range scatter rows
    are dropped via an overflow row. Returns the unpadded
    ``(block_px, block_px)`` contribution; row = x, col = y.
    """
    size_px = block_px + 2 * pad_px
    capacity = field.mask.shape[0]
    num_chunks = max(1, -(-capacity // chunk))
    pad_cap = num_chunks * chunk - capacity
    if pad_cap:
        field = CraterField(*[
            jnp.concatenate([f, jnp.zeros((pad_cap,) + f.shape[1:], f.dtype)])
            for f in field
        ])

    # integer-truncated placement like the reference (:169-176)
    cpx = jnp.floor((field.coordinates[:, 0] - block_origin[0]) / resolution)
    cpy = jnp.floor((field.coordinates[:, 1] - block_origin[1]) / resolution)
    row0 = (cpx + pad_px - patch_px // 2).astype(jnp.int32)
    col0 = (cpy + pad_px - patch_px // 2).astype(jnp.int32)

    # Accumulation buffer with a patch-sized guard band: craters filtered to
    # the padded raster can still have their (max-size) patch overhang the
    # edge; the guard absorbs it without clamping-induced misplacement.
    # dynamic-slice add-update per crater beats XLA scatter by orders of
    # magnitude on TPU for this access pattern.
    guard = patch_px
    buf = jnp.zeros((size_px + 2 * guard, size_px + 2 * guard), jnp.float32)

    def chunk_body(buf, idx):
        sub = CraterField(*[f[idx] for f in field])
        patches = _render_patches(profiles, sub, resolution, z_scale, patch_px)

        def stamp_one(buf, args):
            patch, r0, c0 = args
            r0 = jnp.clip(r0 + guard, 0, size_px + 2 * guard - patch_px)
            c0 = jnp.clip(c0 + guard, 0, size_px + 2 * guard - patch_px)
            cur = jax.lax.dynamic_slice(buf, (r0, c0), (patch_px, patch_px))
            return (
                jax.lax.dynamic_update_slice(buf, cur + patch, (r0, c0)),
                None,
            )

        buf, _ = jax.lax.scan(stamp_one, buf, (patches, row0[idx], col0[idx]))
        return buf, None

    idxs = jnp.arange(num_chunks * chunk).reshape(num_chunks, chunk)
    buf, _ = jax.lax.scan(chunk_body, buf, idxs)
    dem = buf[guard:guard + size_px, guard:guard + size_px]
    return dem[pad_px:size_px - pad_px, pad_px:size_px - pad_px]


@dataclasses.dataclass
class CraterSamplerConf:
    """Crater distribution tiers (CraterDynamicDistributionConf defaults used
    by the large-scale configs: densities [0.025, 0.05, 0.5], radii
    [[1.5, 2.5], [0.75, 1.5], [0.25, 0.5]])."""

    densities: tuple = (0.025, 0.05, 0.5)
    radius_ranges: tuple = ((1.5, 2.5), (0.75, 1.5), (0.25, 0.5))
    num_repeat: int = 1
    num_profiles: int = 100
    capacity_per_block: int = 2048
    min_xy_ratio: float = 0.85
    max_xy_ratio: float = 1.0
    seed: int = 42
