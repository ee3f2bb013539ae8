from . import collider, craters, database, map_manager, point_process, rocks, streaming, upsample
from .orchestrator import LargeScaleConf, LargeScaleTerrainManager
from .costmap import (
    as_costmap,
    costmap_750,
    device_costmap,
    generate_obstacles,
    rasterize_obstacles,
    reference_costmap,
    update_costmap_with_obstacles,
)
from .smallscale import thesis_statistics_terrain
from .surface import (
    STANDALONE_CRATER_BUMPS,
    bump_surface,
    crater_surface,
    imported_surface,
    surface_heightfield,
)

__all__ = [
    "as_costmap",
    "costmap_750",
    "device_costmap",
    "generate_obstacles",
    "rasterize_obstacles",
    "reference_costmap",
    "update_costmap_with_obstacles",
    "STANDALONE_CRATER_BUMPS",
    "bump_surface",
    "crater_surface",
    "imported_surface",
    "surface_heightfield",
    "thesis_statistics_terrain",
]
