"""Simulation manager: the host loop that owns the jitted closed-loop core.

Re-design of ``ROS2_SimulationManager``
(src/environments_wrappers/ros2/simulation_manager_ros2.py:135-251). The
reference's loop per tick: ``world.step`` -> lab/robot ``periodic_update`` ->
``apply_modifications`` (deferred stage edits, applied only *between*
physics steps, :216-233) -> deformation hook -> monitor check, all paced by
a realtime ``Rate``. Here ``world.step`` is one jitted
:func:`~..env.closed_loop.closed_loop_step` over every robot at once, and
the "stage" edits are masked pytree updates queued on the
:class:`~..env.robot_manager.RobotManager` by bus subscribers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.heightfield import HeightField
from ..env.closed_loop import (
    ClosedLoopConfig,
    LoopState,
    closed_loop_step,
    init_loop_state,
)
from ..env.robot_manager import RobotManager
from ..mppi.critics import Costmap
from .monitor import ThreadMonitor
from .pubsub import MessageBus, Topics
from .rate import Rate


@dataclasses.dataclass
class SimulationManagerConf:
    """Loop pacing knobs (cfg/environment largescale.yaml:3-5: physics 60 Hz,
    rendering 30 Hz, realtime-enforced)."""

    loop: ClosedLoopConfig = dataclasses.field(default_factory=ClosedLoopConfig)
    realtime: bool = False       # pace to physics_dt wall-clock
    seed: int = 42
    monitor_poll_s: float = 1.0


class SimulationManager:
    """Owns bus + robots + monitor and drives the jitted loop."""

    def __init__(
        self,
        conf: SimulationManagerConf,
        hf: HeightField,
        costmap: Costmap,
        robots: RobotManager,
        goals: np.ndarray,
        bus: Optional[MessageBus] = None,
        deform_hook: Optional[Callable[[LoopState], LoopState]] = None,
    ):
        self.conf = conf
        self.hf = hf
        self.costmap = costmap
        self.robots = robots
        self.bus = bus or MessageBus()
        self.goals = jnp.asarray(goals, hf.z.dtype)
        self.deform_hook = deform_hook
        self.monitor = ThreadMonitor(poll_s=conf.monitor_poll_s)
        self.monitor.start()
        self._key = jax.random.key(conf.seed)
        self.state = init_loop_state(
            conf.loop, robots.initial_state(hf, dtype=hf.z.dtype), hf.z.dtype
        )
        self.step_count = 0
        self._step = jax.jit(functools.partial(closed_loop_step, conf.loop))
        self._wire_bus()

    # Topic surface -> deferred RobotManager requests (robot_manager_ros2.py
    # :20-118; callbacks only enqueue, application happens between steps).
    def _wire_bus(self) -> None:
        b = self.bus
        b.subscribe(
            Topics.ROBOT_SPAWN,
            lambda m: self.robots.spawn(
                m["name"], m["position"], m.get("heading", (1.0, 0.0, 0.0))
            ),
        )
        b.subscribe(
            Topics.ROBOT_TELEPORT,
            lambda m: self.robots.teleport(
                m["name"], m["position"], m.get("heading", (1.0, 0.0, 0.0))
            ),
        )
        b.subscribe(Topics.ROBOT_RESET, lambda m: self.robots.reset(m["name"]))
        b.subscribe(Topics.ROBOT_RESET_ALL, lambda m: self.robots.reset_all())

    def apply_modifications(self) -> None:
        """Flush deferred stage edits between steps (:226-230)."""
        if self.robots.pending:
            rovers = self.robots.apply_modifications(self.state.rovers, self.hf)
            self.state = self.state._replace(rovers=rovers)

    def step(self) -> LoopState:
        """One sim tick: jitted closed-loop step -> pose publish ->
        deferred-edit flush -> deformation hook."""
        self._key, sub = jax.random.split(self._key)
        self.state = self._step(self.hf, self.costmap, self.goals, self.state, sub)
        self.step_count += 1
        if self.bus.has_subscribers(Topics.POSE_STATE):
            # np.asarray forces a blocking device->host fetch; only pay it
            # when someone is actually listening (keeps the hot loop async)
            self.bus.publish(
                Topics.POSE_STATE,
                {
                    "step": self.step_count,
                    "positions": np.asarray(self.state.rovers.position),
                    "headings": np.asarray(self.state.rovers.heading),
                },
            )
        self.apply_modifications()
        if self.deform_hook is not None:
            self.state = self.deform_hook(self.state)
        return self.state

    def run_simulation(self, num_steps: int) -> LoopState:
        """Main loop with monitor + optional realtime pacing
        (simulation_manager_ros2.py:208-251)."""
        rate = Rate(1.0 / self.conf.loop.rover.physics_dt) if self.conf.realtime else None
        for _ in range(num_steps):
            if not self.monitor.is_alive:
                break
            self.step()
            if rate is not None:
                rate.sleep()
        return self.state

    def close(self) -> None:
        self.monitor.stop(run_shutdowns=True)
