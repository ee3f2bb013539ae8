"""Determine whether the axon backend caches results for repeated identical
executions: time the scanned MPPI loop with (a) identical args per rep and
(b) fresh noise per rep."""

import time
from functools import partial

import jax
import jax.numpy as jnp

from husky_rover_mppi_isaacsim_tpu.core import HeightField
from husky_rover_mppi_isaacsim_tpu.mppi import (
    ControllerState,
    MPPIConfig,
    RobotState,
    mppi_step,
    sample_noise,
)
from husky_rover_mppi_isaacsim_tpu.mppi.controller import kinematic_advance
from husky_rover_mppi_isaacsim_tpu.terrain import (
    STANDALONE_CRATER_BUMPS,
    costmap_750,
    crater_surface,
)

K, H, N = 1000, 100, 50
dtype = jnp.float32


def main():
    hw = 75.0
    z = crater_surface(1500, hw, STANDALONE_CRATER_BUMPS, dtype=dtype)
    hf = HeightField.create(z, hw, dtype=dtype)
    cm = costmap_750(half_width=hw, size=750, use_exact_edt=True)
    cm = cm._replace(cost=cm.cost.astype(dtype),
                     half_width=cm.half_width.astype(dtype),
                     resolution=cm.resolution.astype(dtype))
    config = MPPIConfig(num_samples=K, horizon=H, exact=False)
    goal = jnp.asarray([65.0, 60.0], dtype)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=dtype)
    ctrl = ControllerState.create(config, dtype)

    @partial(jax.jit, static_argnums=0)
    def run_scan(config, hf, cm, goal, robot, c, noises):
        def body(carry, noise):
            r, c = carry
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c), out.costs[0]
        (r, c), cs = jax.lax.scan(body, (robot, c), noises)
        return cs

    def noise_for(seed):
        return jnp.moveaxis(
            sample_noise(jax.random.key(seed), N * K, H, dtype)
            .reshape(2, N, K, H), 1, 0)

    n0 = noise_for(0)
    jax.block_until_ready(run_scan(config, hf, cm, goal, robot, ctrl, n0))

    # (a) identical args, 4 reps
    for i in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(run_scan(config, hf, cm, goal, robot, ctrl, n0))
        print(f"identical args rep{i}: {(time.perf_counter()-t0)*1e3:9.3f} ms total")

    # (b) fresh noise each rep
    for i, seed in enumerate((1, 2, 3, 4)):
        ns = jax.block_until_ready(noise_for(seed))
        t0 = time.perf_counter()
        jax.block_until_ready(run_scan(config, hf, cm, goal, robot, ctrl, ns))
        dt = time.perf_counter() - t0
        print(f"fresh args rep{i}   : {dt*1e3:9.3f} ms total "
              f"({dt/N*1e3:7.4f} ms/loop, {K*H*N/dt:.3e} rollout-steps/s)")


if __name__ == "__main__":
    main()
