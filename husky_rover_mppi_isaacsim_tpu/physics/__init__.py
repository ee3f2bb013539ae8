"""Physics add-ons: terrain deformation, wheel terramechanics, scene config.

Replaces ``src/physics/`` + ``src/terrain_management/deformation_engine.py``:
the PhysX scene itself is replaced by the vectorized rover simulator in
``env``; these modules provide the soil-interaction models layered on top.
"""

import dataclasses

from .deformation import (
    BoundaryDistributionConf,
    DeformationEngine,
    DeformationEngineConf,
    DeformConstrainConf,
    DepthDistributionConf,
    FootprintConf,
    ForceDepthRegressionConf,
)
from .terramechanics import (
    RobotParameter,
    TerrainMechanicalParameter,
    TerramechanicsSolver,
)


@dataclasses.dataclass
class PhysicsSceneConf:
    """Scene-level physics settings (src/physics/physics_scene.py:14-23 +
    cfg/physics/*.yaml): consumed by the env's rover simulator."""

    dt: float = 1.0 / 60.0
    gravity: tuple = (0.0, 0.0, -1.62)  # lunar gravity
    enable_ccd: bool = False
    enable_stabilization: bool = True


__all__ = [
    "BoundaryDistributionConf",
    "DeformationEngine",
    "DeformationEngineConf",
    "DeformConstrainConf",
    "DepthDistributionConf",
    "FootprintConf",
    "ForceDepthRegressionConf",
    "RobotParameter",
    "TerrainMechanicalParameter",
    "TerramechanicsSolver",
    "PhysicsSceneConf",
]
