"""Rigid-body geometry helpers: Rodrigues rotation, heading updates.

Reproduces the math of ``_update_position`` / ``_update_orientation`` /
``_update_orientation_2D`` (thesis_master/warp_implementation/
projection_warp.py:207-275) as batched, jit-compatible functions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def normalize(v: Array) -> Array:
    """v / sqrt(v.v) along the last axis (the Warp kernels' normalization)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / norm


def rodrigues_rotate(v: Array, axis: Array, angle: Array) -> Array:
    """Rotate ``v`` by ``angle`` around unit ``axis`` (Rodrigues formula,
    projection_warp.py:239-244). ``angle`` broadcasts against ``v[..., 0]``."""
    cos_t = jnp.cos(angle)[..., None]
    sin_t = jnp.sin(angle)[..., None]
    return (
        v * cos_t
        + jnp.cross(axis, v) * sin_t
        + axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1.0 - cos_t)
    )


def update_position(
    x: Array, y: Array, heading: Array, linear_velocity: Array, dt: Array
) -> tuple[Array, Array]:
    """Euler position step along the (re-normalized) heading
    (projection_warp.py:207-223)."""
    heading = normalize(heading)
    disp = heading * (linear_velocity * dt)[..., None]
    return x + disp[..., 0], y + disp[..., 1]


def update_orientation(
    heading: Array, angular_velocity: Array, normal: Array, dt: Array
) -> Array:
    """Rotate the heading about the surface normal by ``w*dt`` and
    renormalize (projection_warp.py:225-248)."""
    heading = normalize(heading)
    rotated = rodrigues_rotate(heading, normal, angular_velocity * dt)
    return normalize(rotated)


def update_orientation_2d(heading: Array, angular_velocity: Array, dt: Array) -> Array:
    """Planar heading rotation, z forced to 0 (projection_warp.py:251-275)."""
    theta = angular_velocity * dt
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    new_x = cos_t * heading[..., 0] - sin_t * heading[..., 1]
    new_y = sin_t * heading[..., 0] + cos_t * heading[..., 1]
    norm = jnp.sqrt(new_x * new_x + new_y * new_y)
    safe = norm > 0.0
    new_x = jnp.where(safe, new_x / jnp.where(safe, norm, 1.0), new_x)
    new_y = jnp.where(safe, new_y / jnp.where(safe, norm, 1.0), new_y)
    return jnp.stack([new_x, new_y, jnp.zeros_like(new_x)], axis=-1)
