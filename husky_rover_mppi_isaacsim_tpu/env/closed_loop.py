"""Full-stack closed loop: MPPI controllers driving simulated rovers.

Re-derivation of the env-step semantics of
``visual_terrain_stack_full_terrain.py:466-541`` — the control pipeline the
reference runs against the PhysX Husky — vectorized over N rovers:

* MPPI runs every sim step, but wheel commands are **latched every 3rd step**
  (``if i % 3 == 0``, :477-483) and the PI integrator resets at each latch;
* a per-step PI trim on the latched commands from the measured yaw rate:
  ``err = yaw_meas - w_cmd; left += err/20 + sum(err)/39; right -= ...``
  (:500-508);
* the controller's wheel-speed feedback uses the *stored commanded* speeds,
  not the measured ones (:513-515);
* adaptive exploration stds ``max(0.25, 0.25 -/+ yaw^2/3)`` (:510-511 —
  note: different constants than the standalone goal-seek loop).

Everything (N controllers x K samples rollouts + N rover physics steps) is a
single jitted function per sim step; a ``lax.scan`` driver runs whole
episodes on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core.heightfield import HeightField
from ..mppi.controller import (
    ControllerState,
    MPPIConfig,
    RobotState,
    mppi_step,
)
from ..mppi.critics import Costmap
from ..mppi.sampling import sample_noise
from . import rover_sim
from .rover_sim import RoverParams, RoverState


@dataclasses.dataclass(frozen=True)
class ClosedLoopConfig:
    """Static closed-loop parameters (visual_terrain_stack semantics)."""

    mppi: MPPIConfig = MPPIConfig()
    rover: RoverParams = RoverParams()
    latch_every: int = 3          # new wheel command every 3 sim steps (:477)
    pi_kp: float = 1.0 / 20.0     # err/20 (:507-508)
    pi_ki: float = 1.0 / 39.0     # total_err/39
    std_base: float = 0.25        # adaptive-std constants of the full stack
    std_gain: float = 1.0 / 3.0   # (:510-511)


class LoopState(NamedTuple):
    """Per-rover closed-loop state (leading axis = rover)."""

    rovers: RoverState
    ctrl: ControllerState          # batched: every field (N, ...)
    latched_left: Array            # (N,) latched wheel command
    latched_right: Array
    stored_left: Array             # (N,) commanded speeds fed back to MPPI
    stored_right: Array
    err_total: Array               # (N,) PI integrator
    step_index: Array              # scalar int32


def init_loop_state(
    config: ClosedLoopConfig, rovers: RoverState, dtype=jnp.float32
) -> LoopState:
    n = rovers.position.shape[0]
    ctrl = ControllerState.create(config.mppi, dtype)
    ctrl = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape), ctrl)
    # The full stack starts exploration at the std_base constants.
    ctrl = ctrl._replace(
        std_u1=jnp.full((n,), config.std_base, dtype),
        std_u2=jnp.full((n,), config.std_base, dtype),
    )
    zero = jnp.zeros((n,), dtype)
    return LoopState(
        rovers=rovers,
        ctrl=ctrl,
        latched_left=zero,
        latched_right=zero,
        stored_left=zero,
        stored_right=zero,
        err_total=zero,
        step_index=jnp.asarray(0, jnp.int32),
    )


def _controller_view(rovers: RoverState, stored_left, stored_right) -> RobotState:
    """What the MPPI controller believes about each rover: true pose, but the
    *commanded* wheel speeds (visual_terrain_stack:513-515)."""
    return RobotState(
        position=rovers.position,
        z=rovers.z,
        heading=rovers.heading,
        left_wheel_speed=stored_left,
        right_wheel_speed=stored_right,
    )


def closed_loop_step(
    config: ClosedLoopConfig,
    hf: HeightField,
    costmap: Costmap,
    goals: Array,
    state: LoopState,
    key: Array,
) -> LoopState:
    """One sim step of the full stack for all N rovers.

    Sequence per reference (:466-541): MPPI step -> derive wheel commands ->
    latch every 3rd -> PI trim from measured yaw rate -> physics step ->
    feed back pose + stored commands + adapted stds.
    """
    mcfg = config.mppi
    n = state.rovers.position.shape[0]
    dtype = state.rovers.position.dtype

    k_noise, k_phys = jax.random.split(key)
    noise = sample_noise(
        k_noise, n * mcfg.num_samples, mcfg.horizon, dtype
    ).reshape(2, n, mcfg.num_samples, mcfg.horizon).transpose(1, 0, 2, 3)

    robot_view = _controller_view(state.rovers, state.stored_left, state.stored_right)
    step_fn = functools.partial(mppi_step, mcfg, hf, costmap)
    new_ctrl, out = jax.vmap(step_fn)(goals, robot_view, state.ctrl, noise)

    # Wheel commands from the optimal (v, w) (:474-475).
    lin_cmd = out.linear_velocity
    ang_cmd = out.angular_velocity
    left_stored = lin_cmd - ang_cmd * mcfg.robot_radius / 2
    right_stored = lin_cmd + ang_cmd * mcfg.robot_radius / 2

    # Latch every `latch_every` steps; reset the PI integrator then (:477-483).
    latch = (state.step_index % config.latch_every) == 0
    latched_left = jnp.where(latch, left_stored, state.latched_left)
    latched_right = jnp.where(latch, right_stored, state.latched_right)
    err_total = jnp.where(latch, 0.0, state.err_total)

    # PI yaw-rate trim on the latched commands (:500-508).
    err = state.rovers.yaw_rate - ang_cmd
    err_total = err_total + err
    trim = err * config.pi_kp + err_total * config.pi_ki
    cmd_left = latched_left + trim
    cmd_right = latched_right - trim

    rovers = rover_sim.step(
        config.rover, hf, state.rovers, cmd_left, cmd_right, k_phys
    )

    # Adaptive stds from the measured yaw rate (:510-511).
    yaw2 = rovers.yaw_rate * rovers.yaw_rate
    new_ctrl = new_ctrl._replace(
        std_u1=jnp.maximum(config.std_base, config.std_base - yaw2 * config.std_gain),
        std_u2=jnp.maximum(config.std_base, config.std_base + yaw2 * config.std_gain),
    )

    return LoopState(
        rovers=rovers,
        ctrl=new_ctrl,
        latched_left=latched_left,
        latched_right=latched_right,
        stored_left=left_stored,
        stored_right=right_stored,
        err_total=err_total,
        step_index=state.step_index + 1,
    )


def run_episode(
    config: ClosedLoopConfig,
    hf: HeightField,
    costmap: Costmap,
    goals: Array,
    state: LoopState,
    key: Array,
    num_steps: int,
    record_every: int = 1,
):
    """Run ``num_steps`` sim steps on device via ``lax.scan``; returns the
    final state and recorded rover positions ``(num_steps//record_every, N, 2)``."""

    def body(carry, k):
        state = closed_loop_step(config, hf, costmap, goals, carry, k)
        return state, state.rovers.position

    keys = jax.random.split(key, num_steps)
    state, path = jax.lax.scan(body, state, keys)
    return state, path[::record_every]
