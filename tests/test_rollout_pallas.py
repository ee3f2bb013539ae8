"""The fused Pallas rollout kernel (ops/rollout_pallas.py) must reproduce
the XLA rollout path: bit-exact gathers, same math op-for-op (differences
only at FMA-contraction level — jnp.cross is internally jitted, so even the
"eager" XLA path fuses), and the full pallas-engine control step must make
the same control decisions as the bit-exact engines.

Runs in interpret mode on the CPU test backend — the same kernel code the
chip compiles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from husky_rover_mppi_isaacsim_tpu.core import HeightField
from husky_rover_mppi_isaacsim_tpu.core import heightfield as hfield
from husky_rover_mppi_isaacsim_tpu.core import patch as patch_mod
from husky_rover_mppi_isaacsim_tpu.mppi import (
    ControllerState,
    MPPIConfig,
    RobotState,
    mppi_step,
    sample_noise,
)
from husky_rover_mppi_isaacsim_tpu.mppi import rollout as ro
from husky_rover_mppi_isaacsim_tpu.mppi.critics import Costmap
from husky_rover_mppi_isaacsim_tpu.ops import rollout_pallas as rp


def _world(rng, grid=512, hw=25.0):
    z = jnp.asarray(rng.uniform(0.0, 5.0, (grid, grid)), jnp.float32)
    return HeightField.create(z, hw, dtype=jnp.float32)


def test_kernel_matches_xla_rollout(rng):
    """Chunk kernel vs the XLA patch rollout: identical trajectories up to
    FMA-level drift (gathers are bit-exact; heading normalization walks by
    ~1 ulp/step through the sequential scan)."""
    dtype = jnp.float32
    hf = _world(rng)
    pf = patch_mod.extract_patch(
        hf, jnp.asarray(-3.0, dtype), jnp.asarray(2.0, dtype), 256)
    K, H = 64, 60
    pos = jnp.asarray([-3.0, 2.0], dtype)
    heading = jnp.asarray([0.9, 0.43, 0.0], dtype)
    heading = heading / jnp.linalg.norm(heading)
    lin = jnp.asarray(rng.uniform(0, 2, (K, H)), dtype)
    ang = jnp.asarray(rng.uniform(-1, 1, (K, H)), dtype)

    ref = ro.rollout_25d(pf, pos, heading, lin, ang, 0.045)
    got = ro.rollout_25d_pallas(pf, pos, heading, lin, ang, 0.045)

    np.testing.assert_allclose(
        np.asarray(got.trajectory), np.asarray(ref.trajectory),
        rtol=0, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(got.headings), np.asarray(ref.headings),
        rtol=0, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(got.left_wheel[..., :2]),
        np.asarray(ref.left_wheel[..., :2]), rtol=0, atol=5e-4)
    # wheel heights are nearest-cell gathers: off by at most one cell's
    # height where FMA drift crosses a cell boundary — the overwhelming
    # majority must be bit-identical
    same = (np.asarray(got.left_wheel[..., 2])
            == np.asarray(ref.left_wheel[..., 2])).mean()
    assert same > 0.98


def test_kernel_narrow_form_matches_xla_rollout(rng):
    """Patches above the pack4 threshold (P > 384) take the narrow
    one-selection-at-a-time kernel form (scoped-VMEM bound at streamed-
    terrain patch sizes); it must agree with the XLA path exactly like the
    packed form, wheels included."""
    dtype = jnp.float32
    hf = _world(rng)
    pf = patch_mod.extract_patch(
        hf, jnp.asarray(-3.0, dtype), jnp.asarray(2.0, dtype), 512)
    assert pf.size > 384  # narrow-form trigger
    K, H = 32, 40
    pos = jnp.asarray([-3.0, 2.0], dtype)
    heading = jnp.asarray([0.9, 0.43, 0.0], dtype)
    heading = heading / jnp.linalg.norm(heading)
    lin = jnp.asarray(rng.uniform(0, 2, (K, H)), dtype)
    ang = jnp.asarray(rng.uniform(-1, 1, (K, H)), dtype)

    ref = ro.rollout_25d(pf, pos, heading, lin, ang, 0.045)
    got = ro.rollout_25d_pallas(pf, pos, heading, lin, ang, 0.045)
    np.testing.assert_allclose(
        np.asarray(got.trajectory), np.asarray(ref.trajectory),
        rtol=0, atol=5e-4)
    same = (np.asarray(got.left_wheel[..., 2])
            == np.asarray(ref.left_wheel[..., 2])).mean()
    assert same > 0.98
    same_r = (np.asarray(got.right_wheel[..., 2])
              == np.asarray(ref.right_wheel[..., 2])).mean()
    assert same_r > 0.98


def test_kernel_chunked_matches_single_patch(rng):
    """Chunked kernel calls (128 then 256 patch) agree with one covering
    patch to within FMA-level noise."""
    dtype = jnp.float32
    hf = _world(rng)
    x0 = jnp.asarray(1.5, dtype)
    y0 = jnp.asarray(-2.0, dtype)
    single = patch_mod.extract_patch(hf, x0, y0, 256)
    chunked = ro.ChunkedField(
        patches=(patch_mod.extract_patch(hf, x0, y0, 128), single),
        lengths=(30, 30),
    )
    K, H = 32, 60
    pos = jnp.asarray([1.5, -2.0], dtype)
    heading = jnp.asarray([0.6, -0.8, 0.0], dtype)
    lin = jnp.asarray(rng.uniform(0, 1.0, (K, H)), dtype)
    ang = jnp.asarray(rng.uniform(-1, 1, (K, H)), dtype)
    a = ro.rollout_25d_pallas(single, pos, heading, lin, ang, 0.045)
    b = ro.rollout_25d_pallas(chunked, pos, heading, lin, ang, 0.045)
    np.testing.assert_allclose(
        np.asarray(a.trajectory), np.asarray(b.trajectory),
        rtol=0, atol=5e-4)


def test_pallas_engine_full_step_decisions(rng):
    """gather_engine='pallas' reaches the same control decisions as the
    bit-exact direct engine: identical softmax weight pattern up to
    tolerance and matching optimal command."""
    dtype = jnp.float32
    hf = _world(rng)
    cmap = jnp.asarray(
        np.clip(rng.uniform(-0.5, 1.0, (64, 64)), 0.0, 1.0), dtype)
    cm = Costmap(cost=cmap, half_width=jnp.asarray(25.0, dtype),
                 resolution=jnp.asarray(50.0 / 64, dtype))
    goal = jnp.asarray([18.0, 15.0], dtype)
    robot = RobotState.create(-10.0, -8.0, [1.0, 0.3, 0.0], dtype=dtype)
    noise = sample_noise(jax.random.key(7), 128, 40, dtype)
    base = dict(num_samples=128, horizon=40, exact=False)
    ctrl0 = ControllerState.create(MPPIConfig(**base), dtype)

    _, ref = mppi_step(MPPIConfig(**base), hf, cm, goal, robot, ctrl0, noise)
    _, got = mppi_step(
        MPPIConfig(**base, gather_engine="pallas", patch_size=256,
                   costmap_patch_size=32),
        hf, cm, goal, robot, ctrl0, noise)

    np.testing.assert_allclose(
        np.asarray(got.weights), np.asarray(ref.weights), rtol=0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.linear_velocity), np.asarray(ref.linear_velocity),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got.angular_velocity), np.asarray(ref.angular_velocity),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.optimal_trajectory), np.asarray(ref.optimal_trajectory),
        rtol=0, atol=1e-3)


def test_pallas_requires_f32_patch(rng):
    z = jnp.asarray(rng.uniform(0, 5, (256, 256)), jnp.float64)
    hf = HeightField.create(z, 25.0, dtype=jnp.float64)
    pf = patch_mod.extract_patch(
        hf, jnp.asarray(0.0, jnp.float64), jnp.asarray(0.0, jnp.float64), 128)
    with pytest.raises(ValueError, match="float32"):
        rp.rollout_chunk(
            pf,
            jnp.zeros((4,), jnp.float64), jnp.zeros((4,), jnp.float64),
            jnp.tile(jnp.asarray([1.0, 0, 0], jnp.float64), (4, 1)),
            jnp.ones((4, 8), jnp.float64), jnp.zeros((4, 8), jnp.float64),
            0.045, interpret=True)


def test_auto_engine_selection():
    """auto_engine sizes patches from resolution + reach and picks the
    pallas engine on TPU, direct elsewhere (VERDICT r02 missing #2)."""
    cfg = MPPIConfig(num_samples=1000, horizon=100)
    tpu = cfg.auto_engine(0.025, 0.2, backend="tpu")
    assert tpu.gather_engine == "pallas"
    # reach 9.2 m @2.5 cm needs 742 cells -> quantized 768
    assert tpu.patch_size == 768
    assert tpu.costmap_patch_size == 128
    assert tpu.dem_resolution == 0.025
    cpu = cfg.auto_engine(0.025, 0.2, backend="cpu")
    assert cpu.gather_engine == "direct"
    assert cpu.dem_resolution == 0.025
    # the chosen patch always covers the reach
    assert tpu.patch_size >= tpu.required_patch_cells(0.025)


def test_rollout_chunk_wheels_skip_matches_traj():
    """wheels=False returns identical trajectory/headings (the wheel
    lookups are pure consumers of the carry — skipping them cannot change
    the rollout) with lw = rw = traj aliases."""
    import numpy as np

    from husky_rover_mppi_isaacsim_tpu.core import HeightField
    from husky_rover_mppi_isaacsim_tpu.core.patch import extract_patch
    from husky_rover_mppi_isaacsim_tpu.ops.rollout_pallas import rollout_chunk
    from husky_rover_mppi_isaacsim_tpu.terrain import crater_surface

    hw = 25.0
    z = crater_surface(256, hw, [((-5.0, 8.0), 1.5, 8.0)],
                       dtype=jnp.float32)
    hf = HeightField.create(z, hw, dtype=jnp.float32)
    pf = extract_patch(hf, jnp.asarray(0.0), jnp.asarray(0.0), 128)
    K, H = 8, 20
    rng = np.random.default_rng(0)
    x = jnp.zeros((K,), jnp.float32)
    y = jnp.zeros((K,), jnp.float32)
    hd = jnp.broadcast_to(jnp.asarray([1.0, 0.2, 0.0], jnp.float32), (K, 3))
    hd = (hd / jnp.linalg.norm(hd, axis=-1, keepdims=True)).astype(jnp.float32)
    lin = jnp.asarray(rng.uniform(0.3, 2.0, (K, H)), jnp.float32)
    ang = jnp.asarray(rng.uniform(-0.5, 0.5, (K, H)), jnp.float32)
    full = rollout_chunk(pf, x, y, hd, lin, ang, 0.045, interpret=True)
    slim = rollout_chunk(pf, x, y, hd, lin, ang, 0.045, interpret=True,
                         wheels=False)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(slim[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(slim[1]))
    np.testing.assert_array_equal(np.asarray(slim[2]), np.asarray(slim[0]))
    np.testing.assert_array_equal(np.asarray(slim[3]), np.asarray(slim[0]))
