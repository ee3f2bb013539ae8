"""World <-> controller frame transforms for streamed-terrain operation.

The full-stack reference runs the MPPI controller in a *rotated block-local
frame*: with the terrain window anchored at block ``(bx, by)`` and half-block
offset ``hb``,

    ctrl.x =  world.y - by - hb
    ctrl.y = -(world.x - bx - hb)

(visual_terrain_stack_full_terrain.py:492-497 and the goal mapping :445-455).
On a 25 m block shift ``(dx, dy)`` every controller-frame point rebases by
``(-dy, +dx)`` (:569-575). These transforms keep the jit shapes static: the
window array contents change, coordinates rebase, nothing recompiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array


class BlockFrame(NamedTuple):
    """Anchor of the current terrain window."""

    block_x: Array
    block_y: Array
    half_block: Array

    def origin(self) -> tuple[Array, Array]:
        """Window-center origin (bx + hb, by + hb) (:446, :563)."""
        return self.block_x + self.half_block, self.block_y + self.half_block


def world_to_controller(frame: BlockFrame, x: Array, y: Array):
    """(:492-497): ctrl = (y - by - hb, -(x - bx - hb))."""
    cx = y - frame.block_y - frame.half_block
    cy = -(x - frame.block_x - frame.half_block)
    return cx, cy


def controller_to_world(frame: BlockFrame, cx: Array, cy: Array):
    """Inverse of :func:`world_to_controller`."""
    x = -cy + frame.block_x + frame.half_block
    y = cx + frame.block_y + frame.half_block
    return x, y


def rebase_on_shift(points: Array, shift_x: Array, shift_y: Array) -> Array:
    """Rebase controller-frame points after a block shift (dx, dy) in world:
    ctrl points move by (-dy, +dx) (:569-575). ``points`` is ``(..., 2)``."""
    return jnp.stack(
        [points[..., 0] - shift_y, points[..., 1] + shift_x], axis=-1
    )


def heading_world_to_controller(heading: Array) -> Array:
    """Rotate a world heading vector into the controller frame
    (:498-499: ``[h[1], -h[0], h[2]]``)."""
    return jnp.stack(
        [heading[..., 1], -heading[..., 0], heading[..., 2]], axis=-1
    )


def ema_quat(q1: Array, q2: Array, alpha: Array) -> Array:
    """Hemisphere-corrected exponential-moving-average of two quaternions.

    Re-derivation of ``EMAquat`` (visual_terrain_stack_full_terrain.py:14-26):
    lerp ``q1 -> q2`` with weight ``alpha``, flipping the sign of ``alpha``
    when the quaternions lie in opposite hemispheres (dot < 0), then
    renormalize. Batched over leading axes; quaternions are ``(..., 4)`` in
    the reference's (x, y, z, w) layout (the formula is layout-agnostic).
    """
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    a = jnp.where(dot < 0, -alpha, alpha)
    q = q1 * (1.0 - a) + q2 * a
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
