"""Per-phase profile of the reference-scale initial window build
(VERDICT r03 weak #6 / next-round #7: BENCH_r03 build_s was 315-345 s with
no breakdown).

Phases of TerrainStreamer.update() on a cold cache, timed separately:
  1. crater metadata  — host hardcore-Poisson over the window's blocks
                        (+1 neighbor margin) via sample_craters_by_region
  2. lr patches       — LR DEM slicing for every block
  3. upsample         — bicubic upsample matmuls, all blocks, one block
  4. metadata->fields — randomize_metadata (host) per block
  5. crater stamp     — render_crater_block scans, all blocks, one block
  6. compose          — window concat

Usage:  python scripts/profile_build.py            # reference-scale on TPU
        python scripts/profile_build.py small      # 5-block tiny config
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from husky_rover_mppi_isaacsim_tpu.terrain.map_manager import (
        MapManager,
    )
    from husky_rover_mppi_isaacsim_tpu.terrain.orchestrator import (
        LargeScaleConf,
    )

    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    conf = (LargeScaleConf(block_size=10.0, hr_dem_resolution=0.1,
                           lr_pixel_size=2.0, hr_dem_num_blocks=1,
                           crater_gen_padding=2.0)
            if small else LargeScaleConf())
    # MapManager ctor loads the LR DEM (no window build yet)
    t0 = time.perf_counter()
    mm = MapManager(conf.map_conf)
    t_lr = time.perf_counter() - t0

    s = mm.streamer
    side = s.conf.blocks_per_side
    n = s.conf.num_blocks + 1
    bx, by = s.block_index((0.0, 0.0))
    anchor = (bx - n, by - n)
    keys = [(anchor[0] + i, anchor[1] + j)
            for i in range(side) for j in range(side)]

    # 1. crater metadata (host Poisson, incl. neighbor margin)
    t0 = time.perf_counter()
    rects = s.sample_craters_by_region(
        anchor[0] - 1, anchor[0] + side + 1,
        anchor[1] - 1, anchor[1] + side + 1,
    )
    t_meta = time.perf_counter() - t0

    # 2. LR patches
    t0 = time.perf_counter()
    patches = {k: s._lr_patch(*k) for k in keys}
    jax.block_until_ready(list(patches.values()))
    t_patch = time.perf_counter() - t0

    # 3. upsample all blocks
    from husky_rover_mppi_isaacsim_tpu.terrain.upsample import (
        upsample_bicubic,
    )

    m = 2 * s.conf.upscale_factor
    bpx = s.conf.block_px
    t0 = time.perf_counter()
    bases = {
        k: jax.lax.dynamic_slice(
            upsample_bicubic(patches[k], s.conf.upscale_factor),
            (m, m), (bpx, bpx))
        for k in keys
    }
    jax.block_until_ready(list(bases.values()))
    t_up = time.perf_counter() - t0

    # 4. metadata -> render fields (host)
    t0 = time.perf_counter()
    fields = {k: s._block_fields(*k) for k in keys}
    t_fields = time.perf_counter() - t0

    # 5. crater stamps
    from husky_rover_mppi_isaacsim_tpu.terrain.craters import (
        render_crater_block,
    )

    t0 = time.perf_counter()
    blocks = {}
    for k in keys:
        origin = jnp.asarray(
            [k[0] * s.conf.block_size, k[1] * s.conf.block_size], jnp.float32)
        acc = bases[k]
        for field, patch_px in fields[k]:
            acc = acc + render_crater_block(
                s.profiles, field, origin, s.conf.resolution, s.conf.z_scale,
                s.conf.block_px, s.conf.pad_px, patch_px=patch_px,
                chunk=min(256, field.mask.shape[0]))
        blocks[k] = acc
    jax.block_until_ready(list(blocks.values()))
    t_stamp = time.perf_counter() - t0

    # 6. compose window
    t0 = time.perf_counter()
    rows = [jnp.concatenate([blocks[(anchor[0] + i, anchor[1] + j)]
                             for j in range(side)], axis=1)
            for i in range(side)]
    window = jnp.concatenate(rows, axis=0)
    jax.block_until_ready(window)
    t_comp = time.perf_counter() - t0

    out = {
        "backend": jax.default_backend(),
        "window_px": s.conf.window_px,
        "blocks": len(keys),
        "poisson_rects": rects,
        "phases_s": {
            "lr_dem_load": round(t_lr, 2),
            "crater_metadata_host": round(t_meta, 2),
            "lr_patches": round(t_patch, 2),
            "upsample": round(t_up, 2),
            "metadata_to_fields_host": round(t_fields, 2),
            "crater_stamp": round(t_stamp, 2),
            "compose": round(t_comp, 2),
        },
        "total_s": round(t_lr + t_meta + t_patch + t_up + t_fields
                         + t_stamp + t_comp, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
