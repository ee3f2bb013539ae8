"""Thesis-convention (python_mppi_projection) 2.5D rollout in JAX.

The BASELINE bit-match contract names
``thesis_master/python_mppi_projection/displacement_on_surface.py`` as the
semantic spec. That implementation differs from the production Warp kernels
in three ways (all reproduced here):

* corner indexing ``i = int((x + hw)/res) - 2`` on the *unflipped* grid
  (displacement_on_surface.py:195-201) instead of the Warp flipped-row form;
* floor-based bilinear fractions (``:254-255``) instead of trunc;
* per-step order: position update *and* heading rotation both use the
  previous step's normal (``update_position``, ``:264-295``), then the new
  cell's normal re-projects the heading — whereas the Warp kernel rotates
  about the *new* normal.

Under fixed inputs this matches :func:`compat.numpy_oracle.generate_trajectory_25d`
to float64 round-off (the scipy rotation-vector update is algebraically the
Rodrigues formula used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core import geometry as geom


def reference_corners(z: Array, x: Array, y: Array, resolution: Array,
                      half_width: Array) -> Array:
    """displacement_on_surface.py:192-203 (the ``-2`` offset quirk intact)."""
    i = jnp.trunc((x + half_width) / resolution).astype(jnp.int32) - 2
    j = jnp.trunc((y + half_width) / resolution).astype(jnp.int32) - 2
    q00 = z[j, i]
    q01 = z[j, i + 1]
    q10 = z[j + 1, i]
    q11 = z[j + 1, i + 1]
    return jnp.stack(
        [jnp.stack([q00, q01], axis=-1), jnp.stack([q10, q11], axis=-1)],
        axis=-2,
    )


def reference_bilinear(x: Array, y: Array, q: Array, resolution: Array) -> Array:
    """displacement_on_surface.py:239-262 (floor fractions, same transposed
    weight pairing as the Warp kernel)."""
    xn = x / resolution
    yn = y / resolution
    x2 = xn - jnp.floor(xn)
    y2 = yn - jnp.floor(yn)
    return (
        (1.0 - x2) * (1.0 - y2) * q[..., 0, 0]
        + x2 * (1.0 - y2) * q[..., 1, 0]
        + (1.0 - x2) * y2 * q[..., 0, 1]
        + x2 * y2 * q[..., 1, 1]
    )


def _normal(q: Array, resolution: Array) -> Array:
    """displacement_on_surface.py:205-221 (same formula as the Warp kernel)."""
    vx = -resolution / 2.0 * (q[..., 0, 1] - q[..., 0, 0] - q[..., 1, 0] + q[..., 1, 1])
    vy = -resolution / 2.0 * (q[..., 1, 0] - q[..., 0, 0] - q[..., 0, 1] + q[..., 1, 1])
    vz = resolution * resolution * jnp.ones_like(vx)
    vec = jnp.stack([vx, vy, vz], axis=-1)
    return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)


def _tangent(normal: Array, heading: Array) -> Array:
    """displacement_on_surface.py:223-237."""
    proj = heading - jnp.sum(heading * normal, axis=-1, keepdims=True) * normal
    return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)


def rollout_25d_reference(
    z: Array,
    half_width: Array,
    resolution: Array,
    position: Array,
    heading: Array,
    linear_velocities: Array,
    angular_velocities: Array,
    dt: float,
) -> Array:
    """Batched thesis-reference trajectory generation
    (displacement_on_surface.py:317-369).

    Args mirror :func:`.rollout.rollout_25d` but on the unflipped grid ``z``
    (row 0 at y = -half_width). Returns trajectories ``batch + (H, 3)``.
    The reference's out-of-bounds abort (returning None) is a host-side
    concern; this jit path assumes in-window trajectories like the Warp
    production kernel does.
    """
    lin = jnp.asarray(linear_velocities)
    batch = lin.shape[:-1]
    pos = jnp.broadcast_to(jnp.asarray(position, lin.dtype), batch + (2,))
    hv = jnp.broadcast_to(jnp.asarray(heading, lin.dtype), batch + (3,))

    q = reference_corners(z, pos[..., 0], pos[..., 1], resolution, half_width)
    normal = _normal(q, resolution)
    hv = _tangent(normal, hv)

    def step(carry, inputs):
        pos, hv, normal = carry
        lin_k, ang_k = inputs
        # update_position (:264-295): displace along heading, rotate about
        # the PREVIOUS normal (rotvec == Rodrigues), renormalize.
        hv = geom.normalize(hv)
        disp = hv * (lin_k * dt)[..., None]
        x = pos[..., 0] + disp[..., 0]
        y = pos[..., 1] + disp[..., 1]
        hv = geom.rodrigues_rotate(hv, normal, ang_k * dt)
        hv = geom.normalize(hv)

        q = reference_corners(z, x, y, resolution, half_width)
        height = reference_bilinear(x, y, q, resolution)
        normal = _normal(q, resolution)
        hv = _tangent(normal, hv)

        traj = jnp.stack([x, y, height], axis=-1)
        return (jnp.stack([x, y], axis=-1), hv, normal), traj

    seq = (jnp.moveaxis(lin, -1, 0), jnp.moveaxis(angular_velocities, -1, 0))
    _, traj = jax.lax.scan(step, (pos, hv, normal), seq)
    return jnp.moveaxis(traj, 0, -2)
