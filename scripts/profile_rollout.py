"""One-off profiling experiments for the MPPI hot loop.

Measures variants of the K=1000 x H=100 rollout to localize cost:
  full      : the production mppi_step
  rollout   : rollout_25d alone
  nowheel   : rollout without the two wheel-track gathers
  smallwin  : rollout against a 512^2 dynamic-sliced window
  fusedgather: corner gather as one lax.gather with slice_sizes=(2,2)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from husky_rover_mppi_isaacsim_tpu.core import HeightField
from husky_rover_mppi_isaacsim_tpu.core import geometry as geom
from husky_rover_mppi_isaacsim_tpu.core import heightfield as hfield
from husky_rover_mppi_isaacsim_tpu.mppi import (
    ControllerState,
    MPPIConfig,
    RobotState,
    mppi_step,
    sample_noise,
)
from husky_rover_mppi_isaacsim_tpu.mppi.rollout import WHEEL_OFFSET, rollout_25d
from husky_rover_mppi_isaacsim_tpu.terrain import (
    STANDALONE_CRATER_BUMPS,
    costmap_750,
    crater_surface,
)

K, H = 1000, 100
DT = 0.1


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def rollout_nowheel(hf, position, heading, lin, ang, dt):
    pos = jnp.broadcast_to(position, lin.shape[:-1] + (2,))
    hv = jnp.broadcast_to(heading, lin.shape[:-1] + (3,))
    q0 = hfield.corners_at(hf, pos[..., 0], pos[..., 1])
    n0 = hfield.quad_normal(q0, hf.resolution)
    prev = hfield.tangent_project(n0, hv)

    def step(carry, inputs):
        pos, prev = carry
        lin_k, ang_k = inputs
        x, y = geom.update_position(pos[..., 0], pos[..., 1], prev, lin_k, dt)
        q = hfield.corners_at(hf, x, y)
        height = hfield.bilinear(x, y, q, hf.resolution)
        normal = hfield.quad_normal(q, hf.resolution)
        prev = hfield.tangent_project(normal, prev)
        current = geom.update_orientation(prev, ang_k, normal, dt)
        traj = jnp.stack([x, y, height], axis=-1)
        return (jnp.stack([x, y], axis=-1), current), (traj, current)

    seq = (jnp.moveaxis(lin, -1, 0), jnp.moveaxis(ang, -1, 0))
    _, (traj, headings) = jax.lax.scan(step, (pos, prev), seq, length=H)
    return traj


def corners_fused(hf, x, y):
    """4 corner heights as ONE lax.gather with slice_sizes=(2,2)."""
    i = jnp.trunc((x - hf.x_min) / hf.resolution).astype(jnp.int32)
    j = (-jnp.trunc((y + hf.y_min) / hf.resolution)).astype(jnp.int32)
    idx = jnp.stack([j, i], axis=-1)  # (K, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    q = jax.lax.gather(
        hf.z, idx, dn, slice_sizes=(2, 2), mode=jax.lax.GatherScatterMode.CLIP
    )
    return q  # (K, 2, 2)


def rollout_fusedgather(hf, position, heading, lin, ang, dt):
    pos = jnp.broadcast_to(position, lin.shape[:-1] + (2,))
    hv = jnp.broadcast_to(heading, lin.shape[:-1] + (3,))
    q0 = corners_fused(hf, pos[..., 0], pos[..., 1])
    n0 = hfield.quad_normal(q0, hf.resolution)
    prev = hfield.tangent_project(n0, hv)

    def step(carry, inputs):
        pos, prev = carry
        lin_k, ang_k = inputs
        x, y = geom.update_position(pos[..., 0], pos[..., 1], prev, lin_k, dt)
        q = corners_fused(hf, x, y)
        height = hfield.bilinear(x, y, q, hf.resolution)
        normal = hfield.quad_normal(q, hf.resolution)
        prev = hfield.tangent_project(normal, prev)
        current = geom.update_orientation(prev, ang_k, normal, dt)
        right = WHEEL_OFFSET * jnp.cross(normal, current)
        lx, ly = x + right[..., 0], y + right[..., 1]
        lw = jnp.stack([lx, ly, hfield.nearest_height(hf, lx, ly)], axis=-1)
        rx, ry = x - right[..., 0], y - right[..., 1]
        rw = jnp.stack([rx, ry, hfield.nearest_height(hf, rx, ry)], axis=-1)
        traj = jnp.stack([x, y, height], axis=-1)
        return (jnp.stack([x, y], axis=-1), current), (traj, current, lw, rw)

    seq = (jnp.moveaxis(lin, -1, 0), jnp.moveaxis(ang, -1, 0))
    _, outs = jax.lax.scan(step, (pos, prev), seq, length=H)
    return outs[0]


def main():
    dtype = jnp.float32
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
    noise = sample_noise(jax.random.key(0), K, H, dtype)

    step = jax.jit(mppi_step, static_argnums=0)
    dt_full = timeit(lambda: step(config, hf, cm, goal, robot, ctrl, noise)[1].costs)

    pos = jnp.asarray([-60.0, -60.0], dtype)
    hv = jnp.asarray([1.0, 0.5, 0.0], dtype)
    hv = hv / jnp.linalg.norm(hv)
    lin = jnp.abs(noise[0]) + 0.5
    ang = noise[1]

    r_full = jax.jit(lambda: rollout_25d(hf, pos, hv, lin, ang, DT).trajectory)
    dt_roll = timeit(r_full)

    r_nw = jax.jit(lambda: rollout_nowheel(hf, pos, hv, lin, ang, DT))
    dt_nw = timeit(r_nw)

    # small window: 512^2 slice around robot
    win = jax.lax.dynamic_slice(hf.z, (600, 0), (512, 512))
    hf_small = HeightField(win, hf.x_min, hf.y_min, hf.resolution)
    r_sm = jax.jit(lambda: rollout_25d(hf_small, pos, hv, lin, ang, DT).trajectory)
    dt_sm = timeit(r_sm)

    # tiny window 128^2
    win2 = jax.lax.dynamic_slice(hf.z, (600, 0), (128, 128))
    hf_tiny = HeightField(win2, hf.x_min, hf.y_min, hf.resolution)
    r_ty = jax.jit(lambda: rollout_25d(hf_tiny, pos, hv, lin, ang, DT).trajectory)
    dt_ty = timeit(r_ty)

    r_fg = jax.jit(lambda: rollout_fusedgather(hf, pos, hv, lin, ang, DT))
    dt_fg = timeit(r_fg)

    # check fused gather correctness
    a = jax.device_get(r_full())
    b = jax.device_get(r_fg()).transpose(1, 0, 2)
    err = float(np.abs(a - b).max())

    # K scaling: K=8000
    noise8 = sample_noise(jax.random.key(0), 8000, H, dtype)
    lin8 = jnp.abs(noise8[0]) + 0.5
    ang8 = noise8[1]
    r8 = jax.jit(lambda: rollout_25d(hf, pos, hv, lin8, ang8, DT).trajectory)
    dt_r8 = timeit(r8, iters=20)

    print(f"full mppi_step       : {dt_full*1e3:8.4f} ms")
    print(f"rollout_25d          : {dt_roll*1e3:8.4f} ms")
    print(f"rollout no-wheels    : {dt_nw*1e3:8.4f} ms")
    print(f"rollout 512^2 window : {dt_sm*1e3:8.4f} ms")
    print(f"rollout 128^2 window : {dt_ty*1e3:8.4f} ms")
    print(f"rollout fused gather : {dt_fg*1e3:8.4f} ms   (max err vs base {err:.3e})")
    print(f"rollout K=8000       : {dt_r8*1e3:8.4f} ms   ({dt_r8/dt_roll:.2f}x of K=1000)")


if __name__ == "__main__":
    main()
