"""Trustworthy timing on the axon relay backend: block_until_ready may ACK
before compute finishes, so every measurement here syncs by pulling a
compute-dependent scalar to the host (np.asarray). Per-loop cost is derived
from the SLOPE between two scan lengths, cancelling fixed dispatch+transfer
overhead."""

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

    # noise generated ON DEVICE inside the scan (goal_seek semantics), so a
    # long scan needs no giant noise upload.
    @partial(jax.jit, static_argnums=(0, 5))
    def run_scan(config, hf, cm, goal, carry0, n, key):
        def body(carry, _):
            r, c, k = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, dtype)
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c, k), None
        (r, c, k), _ = jax.lax.scan(body, carry0 + (key,), None, length=n)
        # compute-dependent scalar: forces the whole chain
        return r.position[0] + c.optimal_u1[0]

    def timed(n, seed):
        out = run_scan(config, hf, cm, goal, (robot, ctrl), n, jax.random.key(seed))
        v = float(np.asarray(out))  # host transfer = true sync
        return v

    for n in (8, 64, 256):
        timed(n, 0)  # compile
    # slope timing, fresh keys every call
    results = {}
    for n in (8, 64, 256):
        reps = []
        for s in range(3):
            t0 = time.perf_counter()
            timed(n, 100 + s)
            reps.append(time.perf_counter() - t0)
        results[n] = min(reps)
        print(f"n={n:4d}: total {min(reps)*1e3:9.2f} ms  reps "
              + ", ".join(f"{t*1e3:.1f}" for t in reps))

    per_loop = (results[256] - results[64]) / (256 - 64)
    print(f"slope per-loop: {per_loop*1e3:.4f} ms  "
          f"=> {K*H/per_loop:.3e} rollout-steps/s (K={K}, H={H})")

    # same for the big config
    K2, H2 = 16384, 64
    config2 = MPPIConfig(num_samples=K2, horizon=H2, exact=False)
    ctrl2 = ControllerState.create(config2, dtype)

    @partial(jax.jit, static_argnums=(0, 5))
    def run_scan2(config, hf, cm, goal, carry0, n, key):
        def body(carry, _):
            r, c, k = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K2, H2, dtype)
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c, k), None
        (r, c, k), _ = jax.lax.scan(body, carry0 + (key,), None, length=n)
        return r.position[0] + c.optimal_u1[0]

    def timed2(n, seed):
        out = run_scan2(config2, hf, cm, goal, (robot, ctrl2), n, jax.random.key(seed))
        return float(np.asarray(out))

    for n in (8, 64):
        timed2(n, 0)
    res2 = {}
    for n in (8, 64):
        reps = []
        for s in range(3):
            t0 = time.perf_counter()
            timed2(n, 200 + s)
            reps.append(time.perf_counter() - t0)
        res2[n] = min(reps)
        print(f"big n={n:4d}: total {min(reps)*1e3:9.2f} ms")
    per_loop2 = (res2[64] - res2[8]) / (64 - 8)
    print(f"big slope per-loop: {per_loop2*1e3:.4f} ms  "
          f"=> {K2*H2/per_loop2:.3e} rollout-steps/s (K={K2}, H={H2})")


if __name__ == "__main__":
    main()
