"""Pallas EDT kernel vs the XLA path (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from husky_rover_mppi_isaacsim_tpu.ops.edt import edt_exact_sq
from husky_rover_mppi_isaacsim_tpu.ops.edt_pallas import (
    HAVE_PALLAS,
    edt_minplus_pallas,
)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_minplus_matches_xla(rng):
    from husky_rover_mppi_isaacsim_tpu.ops.edt import _row_distances

    occ = jnp.asarray(rng.random((96, 80)) < 0.02)
    ref = np.asarray(edt_exact_sq(occ))
    g = _row_distances(occ)
    g2 = jnp.minimum(g * g, 1e12)
    got = np.asarray(edt_minplus_pallas(g2, block=32, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_handles_non_multiple_shapes(rng):
    from husky_rover_mppi_isaacsim_tpu.ops.edt import _row_distances

    occ = jnp.asarray(rng.random((50, 70)) < 0.05)
    ref = np.asarray(edt_exact_sq(occ))
    g = _row_distances(occ)
    g2 = jnp.minimum(g * g, 1e12)
    got = np.asarray(edt_minplus_pallas(g2, block=32, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
