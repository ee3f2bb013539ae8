from .edt import chamfer5, distance_costmap, edt_exact, edt_exact_sq, normalize_minmax

__all__ = [
    "chamfer5",
    "distance_costmap",
    "edt_exact",
    "edt_exact_sq",
    "normalize_minmax",
]
