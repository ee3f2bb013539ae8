"""Resolve the scan-vs-host-loop timing discrepancy with repeated,
interleaved measurements and linearity checks."""

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

K, H = 1000, 100
dtype = jnp.float32


def build():
    hw = 75.0
    z = crater_surface(1500, hw, STANDALONE_CRATER_BUMPS, dtype=dtype)
    hf = HeightField.create(z, hw, dtype=dtype)
    cm = costmap_750(half_width=hw, size=750, use_exact_edt=True)
    cm = cm._replace(cost=cm.cost.astype(dtype),
                     half_width=cm.half_width.astype(dtype),
                     resolution=cm.resolution.astype(dtype))
    return hf, cm


def main():
    hf, cm = build()
    config = MPPIConfig(num_samples=K, horizon=H, exact=False)
    goal = jnp.asarray([65.0, 60.0], dtype)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=dtype)
    ctrl = ControllerState.create(config, dtype)

    @partial(jax.jit, static_argnums=(0, 7))
    def run_scan(config, hf, cm, goal, robot, c, noises, n):
        def body(carry, noise):
            r, c = carry
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c), out.costs[0]
        (r, c), cs = jax.lax.scan(body, (robot, c), noises, length=n)
        return cs

    step = jax.jit(mppi_step, static_argnums=0)

    for n in (10, 50, 100):
        noises = jnp.moveaxis(
            sample_noise(jax.random.key(0), n * K, H, dtype).reshape(2, n, K, H),
            1, 0)
        jax.block_until_ready(run_scan(config, hf, cm, goal, robot, ctrl, noises, n))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(
                run_scan(config, hf, cm, goal, robot, ctrl, noises, n))
            ts.append(time.perf_counter() - t0)
        print(f"scan n={n:4d}: total {min(ts)*1e3:9.3f} ms  "
              f"per-loop {min(ts)/n*1e3:8.4f} ms  (3 reps: "
              + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")")

    # host loop, same 50 noises
    n = 50
    noises = jnp.moveaxis(
        sample_noise(jax.random.key(0), n * K, H, dtype).reshape(2, n, K, H),
        1, 0)
    r, c = robot, ctrl
    c, out = step(config, hf, cm, goal, r, c, noises[0])
    jax.block_until_ready(out.costs)
    for rep in range(3):
        r, c = robot, ctrl
        t0 = time.perf_counter()
        for i in range(n):
            c, out = step(config, hf, cm, goal, r, c, noises[i])
            r = kinematic_advance(config, r, out)
        jax.block_until_ready(out.costs)
        print(f"host-loop rep{rep}: per-loop {(time.perf_counter()-t0)/n*1e3:8.4f} ms")


if __name__ == "__main__":
    main()
