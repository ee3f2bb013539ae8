"""Obstacle costmap construction + deterministic regeneration of the
reference's missing ``costmap_750_obs.npy`` fixtures.

The reference's binary fixtures are git-LFS-stripped (.MISSING_LARGE_BLOBS);
per BASELINE.md they must be regenerated deterministically:

* 750 obstacles sampled with ``np.random.RandomState(99)`` over ±50 m with
  radii U(0, 0.4) (MPPI_OO_current.py:722-726) — :func:`generate_obstacles`.
* Disk rasterization with inflation ``r/2 + robot_radius + 0.1`` and the
  reference's swapped local frame (``Surface.create_obstacles_costmap``,
  MPPI_isaac.py:361-372) — :func:`rasterize_obstacles`.
* Distance-transform falloff ``(1 - d_hat)^p`` with p=20 live /
  p=10 offline (MPPI_isaac.py:374-377, create_costmap.py:14-28) —
  :func:`reference_costmap` (cv2-chamfer parity, host) and
  :func:`device_costmap` (exact EDT, on-device production path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..mppi.critics import Costmap
from ..ops.edt import chamfer5, distance_costmap


def generate_obstacles(
    num: int = 750, seed: int = 99, extent: float = 50.0, r_max: float = 0.4
) -> np.ndarray:
    """The deterministic 750-obstacle field (MPPI_OO_current.py:722-726 draw
    order: x, y, r per obstacle). Returns (num, 3) [x, y, radius]."""
    rng = np.random.RandomState(seed)
    obstacles = np.empty((num, 3))
    for i in range(num):
        obstacles[i, 0] = rng.uniform(-extent, extent)
        obstacles[i, 1] = rng.uniform(-extent, extent)
        obstacles[i, 2] = rng.uniform(0.0, r_max)
    return obstacles


def rasterize_obstacles(
    obstacles: np.ndarray,
    origin=(0.0, 0.0),
    half_width: float = 75.0,
    size: int = 750,
    robot_radius: float = 1.2,
    margin: float = 0.1,
) -> np.ndarray:
    """Binary occupancy image, 255 = free / 0 = obstacle (uint8), mirroring
    ``create_obstacles_costmap`` (MPPI_isaac.py:361-372) including the
    reference's swapped local frame: ``x_local = y_g - y0``,
    ``y_local = x_g - x0``."""
    lin = np.linspace(-half_width, half_width, size)
    spacing = 2.0 * half_width / (size - 1)
    img = 255 * np.ones((size, size), dtype=np.uint8)
    x0, y0 = origin
    for xg, yg, r in obstacles:
        x_local = yg - y0
        y_local = xg - x0
        total_radius = r / 2.0 + robot_radius + margin
        # bounding-box clip: identical mask, O(disk) instead of O(size^2)
        # per obstacle (the reference's full-grid mask is the semantic spec)
        c0 = max(0, int(np.floor((x_local - total_radius + half_width) / spacing)))
        c1 = min(size, int(np.ceil((x_local + total_radius + half_width) / spacing)) + 1)
        r0 = max(0, int(np.floor((y_local - total_radius + half_width) / spacing)))
        r1 = min(size, int(np.ceil((y_local + total_radius + half_width) / spacing)) + 1)
        if c0 >= c1 or r0 >= r1:
            continue
        sub_x = lin[c0:c1][None, :]
        sub_y = lin[r0:r1][:, None]
        mask = (sub_x - x_local) ** 2 + (sub_y - y_local) ** 2 <= total_radius**2
        img[r0:r1, c0:c1][mask] = 0
    return img


def reference_costmap(binary_free: np.ndarray, falloff_power: float = 20.0) -> np.ndarray:
    """Host costmap with cv2-chamfer parity (MPPI_isaac.py:374-377):
    chamfer-5 distance transform, min-max normalize, ``(1-d)^p``."""
    d = chamfer5(binary_free)
    d = (d - d.min()) / (d.max() - d.min())
    return (1.0 - d) ** falloff_power


def device_costmap(binary_free, falloff_power: float = 20.0) -> Array:
    """On-device costmap via the exact EDT (:mod:`..ops.edt`). Slightly
    sharper than the chamfer approximation (exact distances); documented
    deviation from cv2, bounded by the chamfer's ~2% error."""
    occupied = jnp.asarray(binary_free) == 0
    return distance_costmap(occupied, falloff_power)


def as_costmap(cost, half_width: float, dtype=None) -> Costmap:
    """Wrap a cost image in the critic-facing :class:`Costmap` window."""
    cost = jnp.asarray(cost, dtype=dtype)
    size = cost.shape[-1]
    dt = cost.dtype
    return Costmap(
        cost=cost,
        half_width=jnp.asarray(half_width, dt),
        resolution=jnp.asarray(2.0 * half_width / size, dt),
    )


def costmap_750(
    half_width: float = 75.0,
    size: int = 750,
    robot_radius: float = 0.3,
    falloff_power: float = 20.0,
    use_exact_edt: bool = False,
) -> Costmap:
    """The regenerated ``costmap_750_transformed`` fixture as a
    :class:`Costmap` (BASELINE config 0: 750x750 grid over the 150 m map).

    ``robot_radius`` defaults to the 0.3 m the reference passes to the
    imported-map Surface (MPPI_OO_current.py:744 ``radius_robot=0.3``) —
    NOT the 1.2 m wheel track of config.yaml; with 1.2 m the 750-obstacle
    field inflates into an impassable wall."""
    obstacles = generate_obstacles()
    binary = rasterize_obstacles(
        obstacles, half_width=half_width, size=size, robot_radius=robot_radius
    )
    if use_exact_edt:
        cost = device_costmap(binary, falloff_power)
    else:
        cost = reference_costmap(binary, falloff_power)
    return as_costmap(cost, half_width)


def update_costmap_with_obstacles(
    costmap_size: int,
    half_width: float,
    obstacles_xy: np.ndarray,
    radii: np.ndarray,
    robot_radius: float,
    falloff_power: float = 20.0,
    use_exact_edt: bool = True,
    origin=(0.0, 0.0),
):
    """Streamed-terrain costmap rebuild: rocks from the rock manager become
    obstacle disks, then the same distance-transform falloff
    (visual_terrain_stack_full_terrain.py:546-576 rebuild path;
    ``origin`` is the window-center world coordinate the reference passes
    as ``(block_x + half_block, block_y + half_block)`` :556-561). Fully
    on-device when ``use_exact_edt``."""
    obstacles_xy = np.asarray(obstacles_xy).reshape(-1, 2)
    obstacles = np.concatenate(
        [obstacles_xy, np.asarray(radii).reshape(-1)[:, None]], axis=-1
    )
    binary = rasterize_obstacles(
        obstacles, origin=origin, half_width=half_width, size=costmap_size,
        robot_radius=robot_radius,
    )
    if use_exact_edt:
        cost = device_costmap(binary, falloff_power)
    else:
        cost = reference_costmap(binary, falloff_power)
    return as_costmap(cost, half_width)
