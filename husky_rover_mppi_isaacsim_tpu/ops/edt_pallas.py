"""Pallas TPU kernel for the exact-EDT lower envelope.

Stage 2 of the exact Euclidean distance transform (see :mod:`.edt`) is a
min-plus product: ``D2[y, x] = min_y' (y - y')^2 + G2[y', x]``. The XLA
formulation materializes (block, R, C) broadcasts; this kernel tiles it like
a matmul — grid (rows/B, cols/B, R/B) with the k axis innermost, the output
tile living in VMEM across the k loop and accumulating a running minimum.
The (y - y')^2 offset tile is generated in-register from ``broadcasted_iota``
— no offset matrix ever touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

try:  # Pallas import is TPU-oriented; keep CPU-only installs working.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_BIG = 1e12


def _minplus_kernel(g2_ref, out_ref):
    i = pl.program_id(0)
    k = pl.program_id(2)
    block = out_ref.shape[0]

    @pl.when(k == 0)
    def _():
        out_ref[:, :] = jnp.full_like(out_ref, _BIG)

    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) + i * block
    ).astype(jnp.float32)
    yprime = (
        jax.lax.broadcasted_iota(jnp.int32, (block, block), 1) + k * block
    ).astype(jnp.float32)
    off = (rows - yprime) ** 2  # (BY, BK)
    g2 = g2_ref[:, :]

    # candidate[y, x] = min_k' off[y, k'] + g2[k', x] — statically chunked
    # over k' (SUB at a time) to keep the broadcast temp at
    # (BY, SUB, BX) instead of (BY, BK, BX).
    SUB = 8
    acc = out_ref[:, :]
    for s in range(0, block, SUB):
        off_s = jnp.expand_dims(
            jax.lax.slice(off, (0, s), (block, s + SUB)), 2
        )  # (BY, SUB, 1)
        g2_s = jnp.expand_dims(
            jax.lax.slice(g2, (s, 0), (s + SUB, block)), 0
        )  # (1, SUB, BX)
        acc = jnp.minimum(acc, jnp.min(off_s + g2_s, axis=1))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def edt_minplus_pallas(g2: Array, block: int = 128,
                       interpret: bool = False) -> Array:
    """Exact squared-EDT column envelope via the Pallas kernel.

    Args:
        g2: (R, C) per-row squared distances (stage 1 output).
        block: tile size (128 = lane width).
        interpret: run in interpreter mode (CPU tests).
    Returns (R, C) squared distances.
    """
    r, c = g2.shape
    rp = -(-r // block) * block
    cp = -(-c // block) * block
    g2p = jnp.pad(g2.astype(jnp.float32), ((0, rp - r), (0, cp - c)),
                  constant_values=_BIG)

    grid = (rp // block, cp // block, rp // block)
    out = pl.pallas_call(
        _minplus_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * rp * cp * rp, transcendentals=0,
            bytes_accessed=4 * (rp * cp * 2 + rp * cp * grid[2]),
        ),
    )(g2p)
    return out[:r, :c]
