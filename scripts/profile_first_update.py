"""Sub-phase timing of the first update_visual_mesh at reference scale —
which cascade member eats the minutes BENCH r04 charged to `build_s`."""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

faulthandler.dump_traceback_later(120, repeat=True)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def mark(name, t0):
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return time.perf_counter()


def main():
    from husky_rover_mppi_isaacsim_tpu.terrain.orchestrator import (
        LargeScaleConf,
        LargeScaleTerrainManager,
    )

    conf = LargeScaleConf()
    t0 = time.perf_counter()
    lstm = LargeScaleTerrainManager(conf)
    lstm._build_map_manager()
    t0 = mark("map_manager_build", t0)
    lstm._build_clipmaps()
    lstm._build_collider_manager()
    lstm._build_rock_samplers()
    t0 = mark("rest_of_build", t0)

    # --- pieces of update_visual_mesh((0,0)) individually ---
    gc = lstm._to_global((0.0, 0.0))
    shifted = lstm.map_manager.update(gc)
    t0 = mark(f"map_manager.update (shifted={shifted})", t0)
    pts = lstm.nested_clipmap.sample(gc)
    t0 = mark("clipmap.sample dispatch", t0)
    jax.block_until_ready(pts)
    t0 = mark("clipmap.sample block_until_ready", t0)

    for i, sampler in enumerate(lstm.rock_samplers):
        blk = sampler.sample_region(gc, block_span=conf.rock_block_span)
        t0 = mark(f"rocks sampler{i} sample_region (n={blk.coordinates.shape[0]})", t0)

    # second update a bit away (in-run cadence)
    upd, corr = lstm.update_visual_mesh((2.5, 0.0))
    t0 = mark(f"second update_visual_mesh (updated={upd})", t0)
    upd, corr = lstm.update_visual_mesh((5.0, 0.0))
    t0 = mark(f"third update_visual_mesh (updated={upd})", t0)
    print("cascade acc:", {k: round(v, 2) if isinstance(v, float) else v
                           for k, v in lstm.cascade_phase_acc.items()},
          flush=True)


if __name__ == "__main__":
    main()
