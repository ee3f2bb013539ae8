"""Round-3 perf iteration harness: component-level slope timings of the
K=1000 x H=100 control loop on the real chip.

Run on TPU (no env overrides): python scripts/profile_r03.py [tags...]
Tags select which measurements run (default: loop).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

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

DTYPE = jnp.float32


def build_world():
    hw = 75.0
    z = crater_surface(1500, hw, STANDALONE_CRATER_BUMPS, dtype=DTYPE)
    hf = HeightField.create(z, hw, dtype=DTYPE)
    cm = costmap_750(half_width=hw, size=750, use_exact_edt=True)
    cm = cm._replace(cost=cm.cost.astype(DTYPE),
                     half_width=cm.half_width.astype(DTYPE),
                     resolution=cm.resolution.astype(DTYPE))
    return hf, cm


def _sync(x):
    return float(np.asarray(x))


def slope_time(fn, ns=(8, 32), reps=2):
    """fn(n, seed) -> synced scalar; returns seconds per unit n."""
    for n in ns:
        fn(n, 0)
    ts = {}
    for n in ns:
        best = 1e9
        for s in range(reps):
            t0 = time.perf_counter()
            fn(n, 50 + s)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])


def loop_timer(hf, cm, config):
    goal = jnp.asarray([65.0, 60.0], DTYPE)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=DTYPE)
    ctrl = ControllerState.create(config, DTYPE)
    K, H = config.num_samples, config.horizon

    @partial(jax.jit, static_argnums=(0, 3))
    def run(config, carry0, key, n):
        def body(carry, _):
            r, c, k = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, DTYPE)
            c, out = mppi_step(config, hf, cm, goal, r, c, noise)
            r = kinematic_advance(config, r, out)
            return (r, c, k), None
        (r, c, _), _ = jax.lax.scan(body, carry0 + (key,), None, length=n)
        return r.position[0] + c.optimal_u1[0]

    return lambda n, seed: _sync(run(config, (robot, ctrl), jax.random.key(seed), n))


def partial_step_timer(hf, cm, config, stage):
    """Timer over scanned *partial* control steps: stage in
    {sample, lag, rollout, critics, weights, optimal}. Each stage includes
    all previous ones; carry keeps the loop dependent."""
    from husky_rover_mppi_isaacsim_tpu.core import patch as patch_mod
    from husky_rover_mppi_isaacsim_tpu.dynamics.skid_steer import (
        wheel_lag_matmul,
    )
    from husky_rover_mppi_isaacsim_tpu.mppi import critics as crit
    from husky_rover_mppi_isaacsim_tpu.mppi import rollout as ro
    from husky_rover_mppi_isaacsim_tpu.mppi.sampling import perturb

    goal = jnp.asarray([65.0, 60.0], DTYPE)
    robot = RobotState.create(-60.0, -60.0, [1.0, 0.5, 0.0], dtype=DTYPE)
    ctrl = ControllerState.create(config, DTYPE)
    K, H = config.num_samples, config.horizon
    track = jnp.asarray(config.robot_radius, DTYPE)
    horizon_m = jnp.asarray(config.horizon_m, DTYPE)

    from husky_rover_mppi_isaacsim_tpu.mppi.controller import _patch_schedule

    roll = (ro.rollout_25d_pallas if config.gather_engine == "pallas"
            else ro.rollout_25d)

    def one(robot, ctrl, noise):
        hfl = hf
        cm_patch = None
        if config.gather_engine in ("onehot", "pallas"):
            schedule = _patch_schedule(config, float(hf.resolution))
            x0, y0 = robot.position[0], robot.position[1]
            if len(schedule) == 1:
                hfl = patch_mod.extract_patch(hf, x0, y0, schedule[0][0])
            else:
                hfl = ro.ChunkedField(
                    patches=tuple(patch_mod.extract_patch(hf, x0, y0, s)
                                  for s, _ in schedule),
                    lengths=tuple(n for _, n in schedule))
            ic, jc = crit.costmap_cells(robot.position[None, :], cm)
            cm_patch = patch_mod.extract_grid_patch(
                cm.cost, ic[0], jc[0], config.costmap_patch_size)
        u1, u2 = perturb(ctrl.optimal_u1, ctrl.optimal_u2, noise,
                         ctrl.std_u1, ctrl.std_u2, config.inputs)
        if stage == "sample":
            return jnp.sum(u1) + jnp.sum(u2)
        k_r, a_r = config.rollout_lag
        lin, ang = wheel_lag_matmul(
            u1, u2, robot.left_wheel_speed, robot.right_wheel_speed, track,
            config.limits, k_r, a_r)
        if stage == "lag":
            return jnp.sum(lin) + jnp.sum(ang)
        r = roll(hfl, robot.position, robot.heading, lin, ang, config.dt)
        traj, headings, lw, rw = r
        if stage == "rollout":
            return jnp.sum(traj[..., -1, :]) + jnp.sum(lw[..., -1, 2])
        costs = crit.evaluate_trajectories(
            robot.position[0], robot.position[1], goal, traj, lw, rw, lin,
            jnp.asarray(config.limits.v_max, DTYPE), cm, horizon_m,
            config.critic_weights, costmap_patch=cm_patch)
        if stage == "critics":
            return jnp.sum(costs)
        weights = crit.softmax_weights(costs, config.temperature)
        opt_u1, opt_u2 = crit.weighted_update(weights, u1, u2)
        if stage == "weights":
            return jnp.sum(opt_u1) + jnp.sum(opt_u2)
        k_o, a_o = config.optimal_lag
        opt_lin, opt_ang = wheel_lag_matmul(
            opt_u1[None], opt_u2[None], robot.left_wheel_speed,
            robot.right_wheel_speed, track, config.limits, k_o, a_o)
        opt = roll(hfl, robot.position, robot.heading,
                   opt_lin, opt_ang, config.dt)
        return jnp.sum(opt.trajectory[0, 0]) + jnp.sum(opt_u1)

    @partial(jax.jit, static_argnums=(2,))
    def run(carry0, key, n):
        def body(carry, _):
            robot, ctrl, k, acc = carry
            k, sub = jax.random.split(k)
            noise = sample_noise(sub, K, H, DTYPE)
            val = one(robot, ctrl, noise)
            # fold the result into the controller state to keep dependence
            ctrl = ctrl._replace(
                optimal_u1=ctrl.optimal_u1 + 1e-20 * val)
            return (robot, ctrl, k, acc + val), None
        (_, _, _, acc), _ = jax.lax.scan(
            body, carry0 + (key, jnp.asarray(0.0, DTYPE)), None, length=n)
        return acc

    return lambda n, seed: _sync(run((robot, ctrl), jax.random.key(seed), n))


def main():
    tags = set(sys.argv[1:]) or {"loop"}
    hf, cm = build_world()
    print("device:", jax.devices()[0])

    def cfg(**kw):
        base = dict(num_samples=1000, horizon=100, exact=False,
                    gather_engine="onehot", patch_size=256,
                    costmap_patch_size=128)
        base.update(kw)
        return MPPIConfig(**base)

    if "loop" in tags:
        t = slope_time(loop_timer(hf, cm, cfg()))
        print(f"onehot  K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "pallas" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(gather_engine="pallas")))
        print(f"pallas  K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "kb256" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(gather_engine="pallas",
                                              pallas_block_k=256)))
        print(f"pallas KB=256 K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "kb512" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(gather_engine="pallas",
                                              pallas_block_k=512)))
        print(f"pallas KB=512 K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "kb1024" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(gather_engine="pallas",
                                              pallas_block_k=1024)))
        print(f"pallas KB=1024 K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "nochunk" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(chunk_patches=False)))
        print(f"onehot-nochunk K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "direct" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(gather_engine="direct")))
        print(f"direct  K=1000 H=100 loop: {t*1e3:.3f} ms")
    if "stages" in tags:
        for stage in ("rollout", "critics", "optimal"):
            t = slope_time(partial_step_timer(hf, cm, cfg(), stage))
            print(f"stage<={stage:8s}: {t*1e3:.3f} ms")
    if "pstages" in tags:
        for stage in ("rollout", "critics", "optimal"):
            t = slope_time(partial_step_timer(
                hf, cm, cfg(gather_engine="pallas"), stage))
            print(f"pallas stage<={stage:8s}: {t*1e3:.3f} ms")
    if "big" in tags:
        t = slope_time(loop_timer(hf, cm, cfg(num_samples=16384, horizon=64)))
        print(f"onehot  K=16384 H=64 loop: {t*1e3:.3f} ms "
              f"({16384*64/t/1e6:.1f}M steps/s)")


if __name__ == "__main__":
    main()
