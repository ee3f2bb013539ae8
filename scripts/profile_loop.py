"""Why is goal_seek 10 ms/loop when the isolated step is 0.37 ms?

Variants timed (all K=1000, H=100, N loops):
  a. python-loop of jitted step, eager noise      (the bench_config number)
  b. python-loop of jitted step, noise INSIDE jit
  c. lax.scan of N steps, pre-generated noise fed as scan input
  d. lax.scan of N steps, threefry noise inside the body
  e. lax.scan of N steps, rbg-PRNG noise inside the body
  f. eager sample_noise alone
"""

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

    step = jax.jit(mppi_step, static_argnums=0)

    # --- a: python loop, eager noise
    def run_a():
        c, k = ctrl, jax.random.key(0)
        for _ in range(N):
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, dtype)
            c, out = step(config, hf, cm, goal, robot, c, noise)
        return out.costs

    jax.block_until_ready(run_a())
    t0 = time.perf_counter(); jax.block_until_ready(run_a())
    dt_a = (time.perf_counter() - t0) / N

    # --- b: noise inside jit, python loop
    @partial(jax.jit, static_argnums=0)
    def step_b(config, hf, cm, goal, robot, c, k):
        k, sub = jax.random.split(k)
        noise = sample_noise(sub, K, H, dtype)
        c, out = mppi_step(config, hf, cm, goal, robot, c, noise)
        return c, k, out

    def run_b():
        c, k = ctrl, jax.random.key(0)
        for _ in range(N):
            c, k, out = step_b(config, hf, cm, goal, robot, c, k)
        return out.costs

    jax.block_until_ready(run_b())
    t0 = time.perf_counter(); jax.block_until_ready(run_b())
    dt_b = (time.perf_counter() - t0) / N

    # --- c: scan with pre-generated noise
    @partial(jax.jit, static_argnums=0)
    def run_c(config, hf, cm, goal, robot, c, noises):
        def body(carry, noise):
            r, c = carry
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c), out.costs[0]
        (r, c), cs = jax.lax.scan(body, (robot, c), noises)
        return cs

    noises = jnp.moveaxis(sample_noise(jax.random.key(0), N * K, H, dtype).reshape(2, N, K, H), 1, 0)
    jax.block_until_ready(run_c(config, hf, cm, goal, robot, ctrl, noises))
    t0 = time.perf_counter()
    jax.block_until_ready(run_c(config, hf, cm, goal, robot, ctrl, noises))
    dt_c = (time.perf_counter() - t0) / N

    # --- d: scan, threefry inside body
    @partial(jax.jit, static_argnums=0)
    def run_d(config, hf, cm, goal, robot, c, key):
        def body(carry, _):
            r, c, k = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, dtype)
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c, k), out.costs[0]
        (r, c, k), cs = jax.lax.scan(body, (robot, c, key), None, length=N)
        return cs

    jax.block_until_ready(run_d(config, hf, cm, goal, robot, ctrl, jax.random.key(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(run_d(config, hf, cm, goal, robot, ctrl, jax.random.key(1)))
    dt_d = (time.perf_counter() - t0) / N

    # --- e: scan, rbg PRNG inside body
    key_rbg = jax.random.key(0, impl="rbg")
    jax.block_until_ready(run_d(config, hf, cm, goal, robot, ctrl, key_rbg))
    t0 = time.perf_counter()
    jax.block_until_ready(
        run_d(config, hf, cm, goal, robot, ctrl, jax.random.key(1, impl="rbg"))
    )
    dt_e = (time.perf_counter() - t0) / N

    # --- f: eager noise alone
    def run_f():
        k = jax.random.key(0)
        for _ in range(N):
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, dtype)
        return noise

    jax.block_until_ready(run_f())
    t0 = time.perf_counter(); jax.block_until_ready(run_f())
    dt_f = (time.perf_counter() - t0) / N

    # --- g: jitted threefry noise alone (same shape), sequential chain
    @jax.jit
    def gen_chain(key):
        def body(k, _):
            k, sub = jax.random.split(k)
            return k, sample_noise(sub, K, H, dtype)
        _, ns = jax.lax.scan(body, key, None, length=N)
        return ns[-1]

    jax.block_until_ready(gen_chain(jax.random.key(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(gen_chain(jax.random.key(1)))
    dt_g = (time.perf_counter() - t0) / N

    print(f"a python-loop eager noise   : {dt_a*1e3:8.4f} ms/loop")
    print(f"b python-loop noise-in-jit  : {dt_b*1e3:8.4f} ms/loop")
    print(f"c scan pre-gen noise        : {dt_c*1e3:8.4f} ms/loop")
    print(f"d scan threefry in body     : {dt_d*1e3:8.4f} ms/loop")
    print(f"e scan rbg in body          : {dt_e*1e3:8.4f} ms/loop")
    print(f"f eager noise alone         : {dt_f*1e3:8.4f} ms/loop")
    print(f"g scanned threefry alone    : {dt_g*1e3:8.4f} ms/loop")


if __name__ == "__main__":
    main()
