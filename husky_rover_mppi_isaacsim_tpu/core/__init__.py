from .heightfield import (
    HeightField,
    bilinear,
    corner_cell,
    corners_at,
    gather_corners,
    height_at,
    nearest_height,
    normal_at,
    quad_normal,
    surface_frame,
    tangent_project,
)
from .geometry import (
    normalize,
    rodrigues_rotate,
    update_orientation,
    update_orientation_2d,
    update_position,
)

__all__ = [
    "HeightField",
    "bilinear",
    "corner_cell",
    "corners_at",
    "gather_corners",
    "height_at",
    "nearest_height",
    "normal_at",
    "quad_normal",
    "surface_frame",
    "tangent_project",
    "normalize",
    "rodrigues_rotate",
    "update_orientation",
    "update_orientation_2d",
    "update_position",
]
