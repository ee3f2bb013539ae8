"""Path metrics (compute_path_metrics, MPPI_isaac.py:231-256), vectorized."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def path_metrics(trajectory: Array, stride: int = 20):
    """Total length, accumulated up/down slope angles (deg) and climbed
    height over strided segments — mirrors the reference's k=20 stride and
    its segment endpoints (i-1, i+k).

    Args:
        trajectory: ``(T, 3)`` or batched ``(..., T, 3)``.
    Returns:
        dict with total_length, total_angle_up, total_angle_down,
        total_distance_up (each ``batch``-shaped).
    """
    t = trajectory.shape[-2]
    idx = jnp.arange(1, max(t - stride, 1), stride)
    seg = trajectory[..., idx + stride, :] - trajectory[..., idx - 1, :]
    seg_len = jnp.linalg.norm(seg, axis=-1)
    planar = jnp.linalg.norm(seg[..., :2], axis=-1)
    angle = jnp.degrees(jnp.arctan2(seg[..., 2], planar))
    valid = seg_len > 0
    return {
        "total_length": jnp.sum(seg_len, axis=-1),
        "total_angle_up": jnp.sum(jnp.where(valid & (angle > 0), angle, 0.0), axis=-1),
        "total_angle_down": jnp.sum(
            jnp.where(valid & (angle < 0), -angle, 0.0), axis=-1
        ),
        "total_distance_up": jnp.sum(
            jnp.where(seg[..., 2] > 0, seg[..., 2], 0.0), axis=-1
        ),
    }


def goal_distances(positions: Array, goals: Array) -> Array:
    """Euclidean distance of each rover to its goal."""
    return jnp.linalg.norm(positions - goals, axis=-1)


def success_mask(positions: Array, goals: Array, box: float = 0.5) -> Array:
    """The reference's per-axis 0.5 m stop box (MPPI_isaac.py:763)."""
    d = jnp.abs(positions - goals)
    return jnp.logical_and(d[..., 0] <= box, d[..., 1] <= box)
