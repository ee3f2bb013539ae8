"""Analytic and imported lunar surfaces for the MPPI stack.

Re-derivations of the surface constructors in the reference thesis stack:

- :func:`bump_surface` — Gaussian hills + arctan ramp
  (displacement_on_surface.py:48-79).
- :func:`crater_surface` — crater-shaped double-Gaussian bumps used by the
  standalone controller experiments (MPPI_isaac.py:307-356 "Craters" branch).
- :func:`imported_surface` — window slice of a NASA DEM ``.npy``
  (MPPI_isaac.py:283-305: indices [start:end] of a 0.1 m/px LOLA-derived
  array, e.g. 1000:2500 for the 150 m x 150 m ``test_nathan`` map).

All constructors are pure jnp so SDG-style per-frame randomization can run
jitted on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.heightfield import HeightField


def _meshgrid(grid_size: int, half_width: float, dtype):
    x = jnp.linspace(-half_width, half_width, grid_size, dtype=dtype)
    y = jnp.linspace(-half_width, half_width, grid_size, dtype=dtype)
    return jnp.meshgrid(x, y)


def bump_surface(
    grid_size: int, half_width: float, bumps, with_ramp: bool = True,
    dtype=jnp.float32,
) -> Array:
    """Sum of Gaussian hills, optional ``0.85*arctan(0.5x)`` ramp."""
    X, Y = _meshgrid(grid_size, half_width, dtype)
    Z = jnp.zeros_like(X)
    for (cx, cy), height, width in bumps:
        Z = Z + height * jnp.exp(
            -((X - cx) ** 2 + (Y - cy) ** 2) / (2.0 * width**2)
        )
    if with_ramp:
        Z = Z + 0.85 * jnp.arctan(0.5 * X)
    return Z


def crater_surface(
    grid_size: int, half_width: float, bumps, dtype=jnp.float32
) -> Array:
    """Crater-like double Gaussians: a broad rim minus a narrow bowl
    (MPPI_isaac.py:318-320)."""
    X, Y = _meshgrid(grid_size, half_width, dtype)
    Z = jnp.zeros_like(X)
    for (cx, cy), height, width in bumps:
        r2 = (X - cx) ** 2 + (Y - cy) ** 2
        Z = Z + (height - 0.5) * jnp.exp(-r2 / (2.0 * width**2))
        Z = Z - (height + 0.5) * jnp.exp(-r2 / (2.0 * (width / 2.0) ** 2))
    return Z


def imported_surface(path: str, start: int = 1000, end: int = 2500) -> np.ndarray:
    """Load a DEM window from ``.npy`` (MPPI_isaac.py:283-305 semantics: the
    file already contains the [start:end] window)."""
    z = np.load(path)
    if z.shape[0] > end - start:
        z = z[start:end, start:end]
    return z


def surface_heightfield(z, half_width: float, dtype=None) -> HeightField:
    """Wrap a height array in the controller's :class:`HeightField` window."""
    return HeightField.create(z, half_width, dtype=dtype)


# Crater bump list of the standalone 150 m experiments
# (MPPI_OO_current.py:753-763 commented setup; kept as a named default so the
# demo/benchmarks are deterministic).
STANDALONE_CRATER_BUMPS = [
    ((-2.7, -19.0), 3.4, 12.23),
    ((-0.57, -0.05), 4.39, 11.52),
    ((-48.56, 12.78), 3.6, 12.4),
    ((-27.89, 38.56), 4.0, 12.7),
    ((-50.12, 19.34), 3.7, 13.0),
    ((20.45, -48.78), 4.4, 12.9),
    ((-20.67, -40.12), 4.2, 12.9),
    ((42.78, 21.56), 4.5, 12.7),
    ((-36.12, -33.34), 3.9, 13.0),
]
