"""Ground-truth phase decomposition of the driver-measured `build_s`
(VERDICT r04 weak #2: BENCH build_s 308-527 s vs the README's "48.6 s
compute" claim). Times every phase of the exact construction path
`bench.bench_largescale` takes: LargeScaleClosedLoop(conf) at reference
scale, then the first terrain updates.

Usage: python scripts/profile_r05_build.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from husky_rover_mppi_isaacsim_tpu.env.closed_loop import ClosedLoopConfig
    from husky_rover_mppi_isaacsim_tpu.env.largescale_loop import (
        LargeScaleClosedLoop,
        LargeScaleLoopConf,
    )
    from husky_rover_mppi_isaacsim_tpu.env.rover_sim import RoverParams
    from husky_rover_mppi_isaacsim_tpu.mppi import MPPIConfig
    from husky_rover_mppi_isaacsim_tpu.terrain.orchestrator import (
        LargeScaleConf,
        LargeScaleTerrainManager,
    )

    phases = {}

    def mark(name, t0):
        phases[name] = round(time.perf_counter() - t0, 2)
        print(f"{name}: {phases[name]:.2f}s", flush=True)
        return time.perf_counter()

    conf = LargeScaleLoopConf(
        terrain=LargeScaleConf(),
        loop=ClosedLoopConfig(
            mppi=MPPIConfig(num_samples=1000, horizon=100),
            rover=RoverParams(),
        ),
        start=(0.0, 0.0),
        goal=(100.0, 8.0),
        max_steps=40000,
        terrain_check_every=48,
    )

    # replicate LargeScaleClosedLoop.__init__ with phase timers
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    lstm = LargeScaleTerrainManager(conf.terrain)
    t0 = mark("lstm_ctor", t0)
    lstm._build_map_manager()          # LR DEM load + initialize_hr_dem
    t0 = mark("map_manager_build", t0)
    lstm._build_clipmaps()
    t0 = mark("clipmaps", t0)
    lstm._build_collider_manager()
    t0 = mark("collider", t0)
    lstm._build_rock_samplers()
    t0 = mark("rock_samplers_ctor", t0)
    lstm.update_visual_mesh((0.0, 0.0))
    t0 = mark("first_update_visual_mesh", t0)
    print("cascade acc after first update:",
          json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in lstm.cascade_phase_acc.items()}),
          flush=True)

    # the rest of LargeScaleClosedLoop.__init__ on the prebuilt lstm —
    # the REAL constructor, phase-timed through its phase_cb hook
    loop = LargeScaleClosedLoop(
        conf, lstm=lstm,
        phase_cb=lambda name, s: (
            phases.__setitem__(name, round(s, 2)),
            print(f"{name}: {s:.2f}s", flush=True)))
    phases["total_build"] = round(time.perf_counter() - t_all, 2)
    print("total_build:", phases["total_build"], flush=True)

    # first chunk dispatch+fetch (compile of the chunk program)
    import jax.numpy as jnp
    import numpy as np

    state = loop._initial_state()
    goal_ctrl = loop._goal_ctrl()
    key = jax.random.key(0)
    window = lstm.map_manager.streamer.window
    frame_ox = jnp.asarray(float(loop.block_x) + loop.half_block, jnp.float32)
    frame_oy = jnp.asarray(float(loop.block_y) + loop.half_block, jnp.float32)
    t0 = time.perf_counter()
    outs = loop._chunk_fn(window, loop.costmap, goal_ctrl, state, key,
                          np.int32(0), frame_ox, frame_oy)
    jax.block_until_ready(outs[-1])
    mark("first_chunk_compile_run", t0)
    t0 = time.perf_counter()
    outs = loop._chunk_fn(window, loop.costmap, goal_ctrl, outs[0], key,
                          np.int32(1), frame_ox, frame_oy)
    jax.block_until_ready(outs[-1])
    mark("second_chunk_run", t0)

    print(json.dumps(phases), flush=True)


if __name__ == "__main__":
    main()
