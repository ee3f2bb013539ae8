"""Sanity-check the suspicious scan-speed result: the scanned MPPI loop must
produce bit-identical results to the host-looped jitted step before its
throughput number is believed."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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

    noises = jnp.moveaxis(
        sample_noise(jax.random.key(0), N * K, H, dtype).reshape(2, N, K, H), 1, 0
    )

    # -- host loop of the jitted step, advancing the robot each loop
    step = jax.jit(mppi_step, static_argnums=0)
    r, c = robot, ctrl
    host_costs0 = []
    for i in range(N):
        c, out = step(config, hf, cm, goal, r, c, noises[i])
        r = kinematic_advance(config, r, out)
        host_costs0.append(float(out.costs[0]))
    host_pos = np.asarray(r.position)
    host_u1 = np.asarray(c.optimal_u1)

    # -- one jitted scan of the same body
    @partial(jax.jit, static_argnums=0)
    def run_scan(config, hf, cm, goal, robot, c, noises):
        def body(carry, noise):
            r, c = carry
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c), out.costs[0]
        (r, c), cs = jax.lax.scan(body, (robot, c), noises)
        return r, c, cs

    rs, cs_state, cs = run_scan(config, hf, cm, goal, robot, ctrl, noises)
    jax.block_until_ready(cs)
    scan_pos = np.asarray(rs.position)
    scan_u1 = np.asarray(cs_state.optimal_u1)
    scan_costs0 = np.asarray(cs)

    print("pos  host", host_pos, " scan", scan_pos,
          " max|d|", np.abs(host_pos - scan_pos).max())
    print("u1   max|d|", np.abs(host_u1 - scan_u1).max())
    print("c0   max|d|", np.abs(np.array(host_costs0) - scan_costs0).max())
    assert np.allclose(host_pos, scan_pos, rtol=0, atol=0), "positions differ"
    assert np.array_equal(host_u1, scan_u1), "optimal_u1 differs"
    assert np.array_equal(np.array(host_costs0, np.float32), scan_costs0)
    print("scan == host loop: BIT-IDENTICAL")

    # -- now time the verified scan
    t0 = time.perf_counter()
    jax.block_until_ready(run_scan(config, hf, cm, goal, robot, ctrl, noises)[2])
    dt = (time.perf_counter() - t0) / N
    print(f"scan: {dt*1e3:.4f} ms per K={K} H={H} control loop "
          f"=> {K*H/dt:.3e} rollout-steps/s")


if __name__ == "__main__":
    main()
