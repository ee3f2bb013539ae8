"""End-to-end control-loop rate: direct vs onehot gather engine, on the real
chip, transfer-synced slope timing (the only timing method this relay does
not distort)."""

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


def measure(config, hf, cm, ns=(8, 32)):
    goal = jnp.asarray([65.0, 60.0], dtype)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=dtype)
    ctrl = ControllerState.create(config, dtype)
    K, H = config.num_samples, config.horizon

    @partial(jax.jit, static_argnums=(0, 3))
    def run(config, carry0, key, n):
        def body(carry, _):
            r, c, k = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, dtype)
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c, k), None
        (r, c, k), _ = jax.lax.scan(body, carry0 + (key,), None, length=n)
        return r.position[0] + c.optimal_u1[0]

    def timed(n, seed):
        return float(np.asarray(run(config, (robot, ctrl), jax.random.key(seed), n)))

    for n in ns:
        timed(n, 0)
    ts = {}
    for n in ns:
        reps = []
        for s in range(3):
            t0 = time.perf_counter()
            timed(n, 50 + s)
            reps.append(time.perf_counter() - t0)
        ts[n] = min(reps)
    per_loop = (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])
    return per_loop


def main():
    hf, cm = build()
    for K, H in ((1000, 100), (16384, 64)):
        for engine in ("direct", "onehot"):
            cfg = MPPIConfig(num_samples=K, horizon=H, exact=False,
                             gather_engine=engine, patch_size=256,
                             costmap_patch_size=128)
            per = measure(cfg, hf, cm)
            print(f"K={K:6d} H={H:3d} {engine:7s}: {per*1e3:9.3f} ms/loop  "
                  f"{K*H/per:.3e} rollout-steps/s  "
                  f"({K*H/per/3.3e7:.1f}x baseline)")


if __name__ == "__main__":
    main()
