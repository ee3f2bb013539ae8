"""Batched 2.5D / 2D trajectory rollouts over a heightfield.

The TPU-native re-design of ``_generate_trajectories_kernel`` and
``_generate_trajectories_2D_kernel``
(thesis_master/warp_implementation/projection_warp.py:284-383).

The reference runs one CUDA thread per trajectory, each doing a sequential
H-step loop of scalar DEM loads. Here the *whole sample batch advances one
horizon step at a time* under a single ``lax.scan``: each step is one
vectorized gather + fused elementwise block over all K samples (and any
leading rover axes), which is the shape XLA tiles well on TPU. The horizon
axis stays sequential — it is a true data dependence (SURVEY.md §5).

Per-step op order matches the Warp kernel exactly (projection_warp.py:312-350)
so fixed-seed rollouts bit-match the NumPy oracle in float64.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core import geometry as geom
from ..core import heightfield as hfield
from ..core import patch as patch_mod
from ..core.heightfield import HeightField
from ..core.patch import PatchField

WHEEL_OFFSET = 0.2  # m, lateral wheel-track offset (projection_warp.py:333)


def _field_ops(hf):
    """Terrain-read ops for either a HeightField (direct XLA gathers) or a
    PatchField (MXU one-hot selection — bit-identical values, see
    core/patch.py). Dispatch is static at trace time."""
    if isinstance(hf, PatchField):
        corners = lambda x, y: patch_mod.corners_at(hf, x, y)
        wheels = lambda lx, ly, rx, ry: patch_mod.nearest_height_pair(
            hf, lx, ly, rx, ry)
        height = lambda x, y: patch_mod.height_at(hf, x, y)
    else:
        corners = lambda x, y: hfield.corners_at(hf, x, y)
        wheels = lambda lx, ly, rx, ry: (
            hfield.nearest_height(hf, lx, ly),
            hfield.nearest_height(hf, rx, ry),
        )
        height = lambda x, y: hfield.height_at(hf, x, y)
    return corners, wheels, height


class Rollout(NamedTuple):
    """Trajectory bundle, each field ``batch + (H, 3)``."""

    trajectory: Array       # (x, y, bilinear height)
    headings: Array         # unit heading vectors after each step
    left_wheel: Array       # (x, y, nearest-cell height) of left wheel track
    right_wheel: Array      # same for right wheel track


def rollout_25d(
    hf: HeightField,
    position: Array,
    heading: Array,
    linear_velocities: Array,
    angular_velocities: Array,
    dt: float,
) -> Rollout:
    """Surface-riding kinematic rollout (projection_warp.py:284-350).

    Args:
        hf: heightfield window.
        position: start position ``batch + (2,)`` (every sample starts at the
            robot pose, MPPI_isaac.py:452).
        heading: previous heading vector ``(3,)`` or ``batch + (3,)``
            (shared across samples in the reference).
        linear_velocities, angular_velocities: ``batch + (H,)``.
        dt: step duration.

    Returns:
        :class:`Rollout` with fields ``batch + (H, 3)``.
    """
    lin = jnp.asarray(linear_velocities)
    batch = lin.shape[:-1]
    horizon = lin.shape[-1]
    pos = jnp.broadcast_to(jnp.asarray(position, lin.dtype), batch + (2,))
    hv = jnp.broadcast_to(jnp.asarray(heading, lin.dtype), batch + (3,))
    corners, wheels, _ = _field_ops(hf)

    # Pre-loop init: project the shared heading onto the start-cell plane
    # (projection_warp.py:306-310).
    q0 = corners(pos[..., 0], pos[..., 1])
    n0 = hfield.quad_normal(q0, hf.resolution)
    prev = hfield.tangent_project(n0, hv)

    def step(carry, inputs):
        pos, prev = carry
        lin_k, ang_k = inputs

        x, y = geom.update_position(pos[..., 0], pos[..., 1], prev, lin_k, dt)
        q = corners(x, y)
        height = hfield.bilinear(x, y, q, hf.resolution)
        normal = hfield.quad_normal(q, hf.resolution)
        prev = hfield.tangent_project(normal, prev)
        current = geom.update_orientation(prev, ang_k, normal, dt)

        traj = jnp.stack([x, y, height], axis=-1)

        # Wheel tracks: +/- offset along normal x heading, nearest-cell height
        # (projection_warp.py:332-348).
        right = WHEEL_OFFSET * jnp.cross(normal, current)
        lx, ly = x + right[..., 0], y + right[..., 1]
        rx, ry = x - right[..., 0], y - right[..., 1]
        lz, rz = wheels(lx, ly, rx, ry)
        lw = jnp.stack([lx, ly, lz], axis=-1)
        rw = jnp.stack([rx, ry, rz], axis=-1)

        new_pos = jnp.stack([x, y], axis=-1)
        return (new_pos, current), (traj, current, lw, rw)

    seq = (jnp.moveaxis(lin, -1, 0), jnp.moveaxis(angular_velocities, -1, 0))
    _, (traj, headings, lw, rw) = jax.lax.scan(step, (pos, prev), seq, length=horizon)

    mv = lambda arr: jnp.moveaxis(arr, 0, -2)
    return Rollout(mv(traj), mv(headings), mv(lw), mv(rw))


def rollout_2d(
    hf: HeightField,
    position: Array,
    heading: Array,
    linear_velocities: Array,
    angular_velocities: Array,
    dt: float,
) -> tuple[Array, Array]:
    """Flat-ground rollout: planar rotation, z looked up from the DEM only
    (projection_warp.py:353-383). Returns (trajectory, headings)."""
    lin = jnp.asarray(linear_velocities)
    batch = lin.shape[:-1]
    horizon = lin.shape[-1]
    pos = jnp.broadcast_to(jnp.asarray(position, lin.dtype), batch + (2,))
    prev = jnp.broadcast_to(jnp.asarray(heading, lin.dtype), batch + (3,))
    _, _, height_at = _field_ops(hf)

    def step(carry, inputs):
        pos, prev = carry
        lin_k, ang_k = inputs
        x, y = geom.update_position(pos[..., 0], pos[..., 1], prev, lin_k, dt)
        current = geom.update_orientation_2d(prev, ang_k, dt)
        height = height_at(x, y)
        traj = jnp.stack([x, y, height], axis=-1)
        return (jnp.stack([x, y], axis=-1), current), (traj, current)

    seq = (jnp.moveaxis(lin, -1, 0), jnp.moveaxis(angular_velocities, -1, 0))
    _, (traj, headings) = jax.lax.scan(step, (pos, prev), seq, length=horizon)
    return jnp.moveaxis(traj, 0, -2), jnp.moveaxis(headings, 0, -2)
