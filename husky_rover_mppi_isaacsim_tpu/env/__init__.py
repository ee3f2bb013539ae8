from .closed_loop import (
    ClosedLoopConfig,
    LoopState,
    closed_loop_step,
    init_loop_state,
    run_episode,
)
from .frames import (
    BlockFrame,
    controller_to_world,
    ema_quat,
    heading_world_to_controller,
    rebase_on_shift,
    world_to_controller,
)
from .largescale_loop import (
    LargeScaleClosedLoop,
    LargeScaleLoopConf,
    LargeScaleRunResult,
)
from .metrics import goal_distances, path_metrics, success_mask
from .robot_manager import RobotManager, RobotSpec
from .rover_sim import (
    RoverParams,
    RoverState,
    contact_forces,
    reset_mask,
    step,
    teleport,
)

__all__ = [
    "ClosedLoopConfig",
    "LoopState",
    "closed_loop_step",
    "init_loop_state",
    "run_episode",
    "BlockFrame",
    "controller_to_world",
    "ema_quat",
    "heading_world_to_controller",
    "rebase_on_shift",
    "world_to_controller",
    "LargeScaleClosedLoop",
    "LargeScaleLoopConf",
    "LargeScaleRunResult",
    "goal_distances",
    "path_metrics",
    "success_mask",
    "RobotManager",
    "RobotSpec",
    "RoverParams",
    "RoverState",
    "contact_forces",
    "reset_mask",
    "step",
    "teleport",
]
