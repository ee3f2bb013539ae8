"""MPPI input sampling: receding-horizon perturbation of the optimal sequence.

Reproduces ``_generate_inputs_kernel``
(thesis_master/warp_implementation/sampling_warp.py:54-92): every (sample,
step) perturbs the previous optimal input sequence *shifted by one step*
(receding horizon; the final step re-uses the last optimal input), scaled by a
per-channel std-dev, and clamps to ``[u_min, u_max]``.

RNG: the reference draws ``wp.randn(seed + tid)`` per thread with a host-side
``np.random.default_rng(42).integers(H+1, 1000)`` seed per control loop
(MPPI_isaac.py:517). Warp's hash-based Gaussian stream is not reproducible in
JAX, and the bit-match contract is against the NumPy reference
(BASELINE.md) — so sampling here is split:

* :func:`perturb` is pure given the noise: oracle tests and NumPy parity
  inject the identical noise array into both implementations.
* :func:`sample_noise` provides the production counter-based stream
  (threefry), folded per control loop for reproducibility across restarts.
* :class:`LoopSeedSequence` mirrors the host-side seed stream so logged runs
  can be replayed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class InputLimits(NamedTuple):
    """Per-channel perturbation parameters (config.yaml:18-24)."""

    std_u1: float = 0.25
    min_u1: float = -1.0
    max_u1: float = 1.0
    std_u2: float = 0.25
    min_u2: float = -1.0
    max_u2: float = 1.0


def shift_receding(optimal_u: Array) -> Array:
    """Shift the optimal sequence one step forward, repeating the last entry
    (sampling_warp.py:71-92 index arithmetic: step h reads optimal[h+1] except
    the final step which reads optimal[H-1])."""
    return jnp.concatenate([optimal_u[1:], optimal_u[-1:]], axis=0)


def perturb(
    optimal_u1: Array,
    optimal_u2: Array,
    noise: Array,
    std_u1: Array,
    std_u2: Array,
    limits: InputLimits,
) -> tuple[Array, Array]:
    """Perturbed input bundles.

    Args:
        optimal_u1, optimal_u2: ``(H,)`` previous optimal inputs.
        noise: ``(2, K, H)`` standard-normal draws.
        std_u1, std_u2: scalar std-devs (traced: the goal-seek loop adapts
            them per step, MPPI_isaac.py:777-778).
    Returns:
        (u1, u2), each ``(K, H)``, clamped.
    """
    base1 = shift_receding(optimal_u1)
    base2 = shift_receding(optimal_u2)
    u1 = jnp.clip(base1[None, :] + std_u1 * noise[0], limits.min_u1, limits.max_u1)
    u2 = jnp.clip(base2[None, :] + std_u2 * noise[1], limits.min_u2, limits.max_u2)
    return u1, u2


def sample_noise(key: Array, num_samples: int, horizon: int, dtype=jnp.float32) -> Array:
    """Standard-normal noise of shape ``(2, K, H)``."""
    return jax.random.normal(key, (2, num_samples, horizon), dtype=dtype)


class LoopSeedSequence:
    """Mirror of the reference's per-loop seed stream:
    ``np.random.default_rng(42).integers(H+1, 1000)`` (MPPI_isaac.py:409, 517).

    Used to label/replay control loops deterministically; the drawn integer is
    folded into the JAX key for that loop.
    """

    def __init__(self, horizon: int, seed: int = 42):
        self._rng = np.random.default_rng(seed)
        self._low = horizon + 1
        self._high = 1000

    def next_seed(self) -> int:
        return int(self._rng.integers(self._low, self._high))


def loop_key(base_key: Array, loop_seed: int) -> Array:
    """Key for one control loop, derived from the replayable loop seed."""
    return jax.random.fold_in(base_key, loop_seed)
