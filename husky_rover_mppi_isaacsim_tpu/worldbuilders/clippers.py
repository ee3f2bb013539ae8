"""Clippers: DEM-conditioned post-processing of sampled positions.

Re-derivation of ``WorldBuilders/Clippers.py`` (reference :5-103):

- :class:`HeightClipper` — z = DEM[uv(x, y)] with the three origin modes;
- :class:`NormalMapClipper` — DEM gradient -> slope angles -> quaternion
  (the ``quaternion`` package replaced by scipy; the reference feeds
  *degrees* into a radians API — reproduced faithfully, documented).

Lookups are vectorized; the reference loops per point.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

from . import types as T


class BaseClipper:
    def __init__(self, cfg: T.Clipper_T):
        self._cfg = cfg
        self.image = np.asarray(cfg.data)
        self.resolution = cfg.resolution
        self.mpp_resolution = cfg.mpp_resolution
        assert self.image.ndim == 2, "clipper image must be single-channel"

    def _to_uv(self, x, y):
        """Cartesian -> pixel coordinates per origin mode (Clippers.py:31-43)."""
        H, W = self.resolution
        if self._cfg.loc_origin == "lower":
            u = x // self.mpp_resolution
            v = (H - 1) - y // self.mpp_resolution
        elif self._cfg.loc_origin == "upper":
            u = x // self.mpp_resolution
            v = y // self.mpp_resolution
        else:  # center
            u = W // 2 + x // self.mpp_resolution
            v = H // 2 + y // self.mpp_resolution
        u = np.clip(u.astype(int), 0, self.image.shape[1] - 1)
        v = np.clip(v.astype(int), 0, self.image.shape[0] - 1)
        return u, v

    def __call__(self, query_point=None, **kwargs):
        return self.sample(query_point=query_point, **kwargs)


class HeightClipper(BaseClipper):
    """z lookup (Clippers.py:20-46)."""

    def sample(self, query_point, **kwargs):
        u, v = self._to_uv(query_point[:, 0], query_point[:, 1])
        return self.image[v, u][:, None]


class NormalMapClipper(BaseClipper):
    """Gradient -> slope -> quaternion (Clippers.py:48-87). The reference
    computes slopes in degrees and passes them to a radians-based
    from_euler_angles — kept verbatim for behavioral parity."""

    def __init__(self, cfg: T.NormalMapClipper_T):
        super().__init__(cfg)
        nx, ny = np.gradient(self.image)
        self.slope_x = np.rad2deg(np.arctan2(nx, 1))
        self.slope_y = np.rad2deg(np.arctan2(ny, 1))

    def sample(self, query_point, **kwargs):
        u, v = self._to_uv(query_point[:, 0], query_point[:, 1])
        roll = self.slope_y[v, u]
        pitch = self.slope_x[v, u]
        yaw = np.zeros_like(roll)
        # wxyz to mirror numpy-quaternion's as_float_array ordering
        q = Rotation.from_euler("zyz", np.stack([roll, pitch, yaw], axis=-1)).as_quat()
        return np.concatenate([q[:, 3:4], q[:, 0:3]], axis=-1)


class ClipperFactory:
    def __init__(self):
        self._creators = {}

    def register(self, name, cls):
        self._creators[name] = cls

    def get(self, cfg, **kwargs):
        name = cfg.__class__.__name__
        if name not in self._creators:
            raise ValueError(f"Unknown clipper requested: {name}")
        return self._creators[name](cfg)


Clipper_Factory = ClipperFactory()
Clipper_Factory.register("ImageClipper_T", HeightClipper)
Clipper_Factory.register("NormalMapClipper_T", NormalMapClipper)
