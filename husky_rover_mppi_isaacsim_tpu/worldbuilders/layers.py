"""Geometric layers: domains that map sampler output into world space.

Re-derivation of ``WorldBuilders/Layers.py`` (reference :9-1151): each layer
owns a sampler, installs its boundary check, exposes ``__call__(num)`` =
sample -> project (pad missing output axes with zeros) -> optional rigid
transform. Point processes receive the layer bounds/area so densities are
per-area.
"""

from __future__ import annotations

import copy

import numpy as np

from . import types as T
from .samplers import Sampler_Factory


def _rot2d(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def _rot3d_from_quat(x, y, z, w):
    q0, q1, q2, q3 = w, x, y, z
    return 2 * np.array([
        [q0 * q0 + q1 * q1, q1 * q2 - q0 * q3, q1 * q3 + q0 * q2],
        [q1 * q2 + q0 * q3, q0 * q0 + q2 * q2, q2 * q3 - q0 * q1],
        [q1 * q3 - q0 * q2, q2 * q3 + q0 * q1, q0 * q0 + q3 * q3],
    ]) - np.eye(3)


def _rot3d_from_euler(x, y, z):
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    return np.array([
        [cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz],
        [cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz],
        [-sy, sx * cy, cx * cy],
    ])


class BaseLayer:
    def __init__(self, layer_cfg: T.Layer_T, sampler_cfg):
        self._layer_cfg = copy.copy(layer_cfg)
        self._sampler_cfg = copy.copy(sampler_cfg)
        self._skip_projection = (
            layer_cfg.output_space == sampler_cfg.randomization_space
        )
        self._T = None
        if layer_cfg.transform is not None:
            if isinstance(layer_cfg.transform, T.Transformation2D_T):
                tr = layer_cfg.transform
                self._T = np.eye(3)
                self._T[:2, :2] = _rot2d(tr.orientation.theta)
                self._T[:2, 2] = [tr.translation.x, tr.translation.y]
            else:
                tr = layer_cfg.transform
                self._T = np.eye(4)
                o = tr.orientation
                if isinstance(o, T.Quaternion_T):
                    self._T[:3, :3] = _rot3d_from_quat(o.x, o.y, o.z, o.w)
                else:
                    self._T[:3, :3] = _rot3d_from_euler(o.x, o.y, o.z)
                self._T[:3, 3] = [tr.translation.x, tr.translation.y, tr.translation.z]
        self.get_bounds()
        self._sampler = Sampler_Factory.get(self._sampler_cfg)
        self._sampler.set_check_fn(self.check_boundaries)
        self._area = getattr(self, "_area", None)

    # overridables -----------------------------------------------------------
    def get_bounds(self):
        self._bounds = None

    def check_boundaries(self, points):
        return np.ones(points.shape[0], dtype=bool)

    def sample(self, num=1, **kwargs):
        return self._sampler(
            num=num, bounds=self._bounds, area=self._area, **kwargs
        )

    # pipeline ---------------------------------------------------------------
    def project(self, points):
        if self._skip_projection:
            return points
        pad = self._layer_cfg.output_space - points.shape[-1]
        if pad <= 0:
            return points
        return np.concatenate([points, np.zeros((points.shape[0], pad))], axis=-1)

    def transform(self, points):
        if self._T is None:
            return points
        ones = np.ones((points.shape[0], 1))
        return (self._T @ np.concatenate([points, ones], axis=-1).T).T[:, :-1]

    def __call__(self, num=1, **kwargs):
        points = self.sample(num=num, **kwargs)
        return self.transform(self.project(points))


class LineLayer(BaseLayer):
    """Layers.py:360-414."""

    def get_bounds(self):
        self._bounds = np.array([[self._layer_cfg.xmin, self._layer_cfg.xmax]])

    def check_boundaries(self, points):
        return (points[:, 0] >= self._layer_cfg.xmin) & (
            points[:, 0] <= self._layer_cfg.xmax
        )


class CircleLayer(BaseLayer):
    """Angle domain mapped onto an (alpha, beta)-scaled circle
    (Layers.py:416-497)."""

    def get_bounds(self):
        self._bounds = np.array(
            [[self._layer_cfg.theta_min, self._layer_cfg.theta_max]]
        )

    def check_boundaries(self, points):
        return (points[:, 0] >= self._layer_cfg.theta_min) & (
            points[:, 0] <= self._layer_cfg.theta_max
        )

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        theta = self._sampler(num=num, bounds=self._bounds, **kwargs)
        theta = theta.reshape(-1)
        x = cfg.center[0] + np.cos(theta) * cfg.radius * cfg.alpha
        y = cfg.center[1] + np.sin(theta) * cfg.radius * cfg.beta
        return np.stack([x, y]).T


class PlaneLayer(BaseLayer):
    """Layers.py:498-557."""

    def get_bounds(self):
        cfg = self._layer_cfg
        self._bounds = np.array(
            [[cfg.xmin, cfg.xmax], [cfg.ymin, cfg.ymax]]
        )

    def check_boundaries(self, points):
        cfg = self._layer_cfg
        return (
            (points[:, 0] >= cfg.xmin) & (points[:, 0] <= cfg.xmax)
            & (points[:, 1] >= cfg.ymin) & (points[:, 1] <= cfg.ymax)
        )


class DiskLayer(BaseLayer):
    """Unit-square sampler output mapped to an annular sector with
    area-correct sqrt radial warp (Layers.py:558-632)."""

    def get_bounds(self):
        cfg = self._layer_cfg
        self._bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
        # reference formula verbatim (Layers.py:608). NOTE: the true
        # annular-sector area is 0.5*dtheta*(r_max^2 - r_min^2); the
        # reference's (dtheta)*(dr)^2 mis-scales Poisson intensities on
        # disks — replicated for parity with upstream scene densities.
        self._area = (cfg.theta_max - cfg.theta_min) * (
            cfg.radius_max - cfg.radius_min
        ) ** 2

    def check_boundaries(self, points):
        return (
            (points[:, 0] >= 0) & (points[:, 0] <= 1)
            & (points[:, 1] >= 0) & (points[:, 1] <= 1)
        )

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        rand = self._sampler(num=num, bounds=self._bounds, area=self._area, **kwargs)
        rmin_n = (cfg.radius_min / max(cfg.radius_max, 1e-12)) ** 2
        r_rescaled = rmin_n + rand[:, 0] * (1.0 - rmin_n)
        r = np.sqrt(r_rescaled) * cfg.radius_max
        t = cfg.theta_min + rand[:, 1] * (cfg.theta_max - cfg.theta_min)
        x = cfg.center[0] + np.cos(t) * r * cfg.alpha
        y = cfg.center[1] + np.sin(t) * r * cfg.beta
        return np.stack([x, y]).T


class PolygonLayer(BaseLayer):
    """Uniform sampling inside a simple polygon by bounding-box rejection
    (Layers.py Polygon_T handling)."""

    def get_bounds(self):
        v = np.asarray(self._layer_cfg.vertices, dtype=float)
        self._vertices = v
        self._bounds = np.array(
            [[v[:, 0].min(), v[:, 0].max()], [v[:, 1].min(), v[:, 1].max()]]
        )

    def check_boundaries(self, points):
        v = self._vertices
        n = v.shape[0]
        inside = np.zeros(points.shape[0], dtype=bool)
        x, y = points[:, 0], points[:, 1]
        j = n - 1
        for i in range(n):
            cond = ((v[i, 1] > y) != (v[j, 1] > y)) & (
                x < (v[j, 0] - v[i, 0]) * (y - v[i, 1]) / (v[j, 1] - v[i, 1] + 1e-30)
                + v[i, 0]
            )
            inside ^= cond
            j = i
        return inside

    def sample(self, num=1, **kwargs):
        pts = self._sampler(num=num, bounds=self._bounds, **kwargs)
        return pts[self.check_boundaries(pts)]


class CubeLayer(BaseLayer):
    """Layers.py:633-694."""

    def get_bounds(self):
        cfg = self._layer_cfg
        self._bounds = np.array([
            [cfg.xmin, cfg.xmax], [cfg.ymin, cfg.ymax], [cfg.zmin, cfg.zmax]
        ])

    def check_boundaries(self, points):
        cfg = self._layer_cfg
        return (
            (points[:, 0] >= cfg.xmin) & (points[:, 0] <= cfg.xmax)
            & (points[:, 1] >= cfg.ymin) & (points[:, 1] <= cfg.ymax)
            & (points[:, 2] >= cfg.zmin) & (points[:, 2] <= cfg.zmax)
        )


class SphereLayer(BaseLayer):
    """Unit-cube output mapped to a spherical shell sector with cube-root
    radial warp (Layers.py:762-843)."""

    def get_bounds(self):
        self._bounds = np.array([[0.0, 1.0]] * 3)

    def check_boundaries(self, points):
        return np.all((points >= 0) & (points <= 1), axis=-1)

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        rand = self._sampler(num=num, bounds=self._bounds, **kwargs)
        rmin_n = (cfg.radius_min / max(cfg.radius_max, 1e-12)) ** 3
        r = np.cbrt(rmin_n + rand[:, 0] * (1 - rmin_n)) * cfg.radius_max
        t = cfg.theta_min + rand[:, 1] * (cfg.theta_max - cfg.theta_min)
        p = cfg.phi_min + rand[:, 2] * (cfg.phi_max - cfg.phi_min)
        x = cfg.center[0] + r * np.sin(p) * np.cos(t)
        y = cfg.center[1] + r * np.sin(p) * np.sin(t)
        z = cfg.center[2] + r * np.cos(p)
        return np.stack([x, y, z]).T


class CylinderLayer(BaseLayer):
    """Layers.py:844-925."""

    def get_bounds(self):
        self._bounds = np.array([[0.0, 1.0]] * 3)

    def check_boundaries(self, points):
        return np.all((points >= 0) & (points <= 1), axis=-1)

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        rand = self._sampler(num=num, bounds=self._bounds, **kwargs)
        rmin_n = (cfg.radius_min / max(cfg.radius_max, 1e-12)) ** 2
        r = np.sqrt(rmin_n + rand[:, 0] * (1 - rmin_n)) * cfg.radius_max
        t = cfg.theta_min + rand[:, 1] * (cfg.theta_max - cfg.theta_min)
        h = cfg.height_min + rand[:, 2] * (cfg.height_max - cfg.height_min)
        x = cfg.center[0] + r * np.cos(t)
        y = cfg.center[1] + r * np.sin(t)
        z = cfg.center[2] + h
        return np.stack([x, y, z]).T


class ConeLayer(BaseLayer):
    """Radius shrinking linearly with height (Layers.py:926-1007)."""

    def get_bounds(self):
        self._bounds = np.array([[0.0, 1.0]] * 3)

    def check_boundaries(self, points):
        return np.all((points >= 0) & (points <= 1), axis=-1)

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        rand = self._sampler(num=num, bounds=self._bounds, **kwargs)
        h = cfg.height_min + rand[:, 2] * (cfg.height_max - cfg.height_min)
        frac = 1.0 - (h - cfg.height_min) / max(cfg.height_max - cfg.height_min, 1e-12)
        r_top = cfg.radius_min + frac * (cfg.radius_max - cfg.radius_min)
        r = np.sqrt(rand[:, 0]) * r_top
        t = cfg.theta_min + rand[:, 1] * (cfg.theta_max - cfg.theta_min)
        x = cfg.center[0] + r * np.cos(t)
        y = cfg.center[1] + r * np.sin(t)
        z = cfg.center[2] + h
        return np.stack([x, y, z]).T


class TorusLayer(BaseLayer):
    """Layers.py:1008-1091."""

    def get_bounds(self):
        self._bounds = np.array([[0.0, 1.0]] * 3)

    def check_boundaries(self, points):
        return np.all((points >= 0) & (points <= 1), axis=-1)

    def sample(self, num=1, **kwargs):
        cfg = self._layer_cfg
        rand = self._sampler(num=num, bounds=self._bounds, **kwargs)
        rmin_n = (cfg.tube_radius_min / max(cfg.tube_radius_max, 1e-12)) ** 2
        r = np.sqrt(rmin_n + rand[:, 0] * (1 - rmin_n)) * cfg.tube_radius_max
        t = cfg.theta_min + rand[:, 1] * (cfg.theta_max - cfg.theta_min)
        p = cfg.phi_min + rand[:, 2] * (cfg.phi_max - cfg.phi_min)
        x = cfg.center[0] + (cfg.ring_radius + r * np.cos(p)) * np.cos(t)
        y = cfg.center[1] + (cfg.ring_radius + r * np.cos(p)) * np.sin(t)
        z = cfg.center[2] + r * np.sin(p)
        return np.stack([x, y, z]).T


class ImageLayer(BaseLayer):
    """Mask-weighted sampling domain (Layers.py:267-322): the sampler draws
    pixels proportional to the mask."""

    def __init__(self, layer_cfg, sampler_cfg):
        super().__init__(layer_cfg, sampler_cfg)
        self._sampler.set_mask(
            np.asarray(layer_cfg.data, float), layer_cfg.mpp_resolution
        )
        self._sampler._cfg.use_image_sampling = True

    def get_bounds(self):
        data = np.asarray(self._layer_cfg.data)
        mpp = self._layer_cfg.mpp_resolution
        self._bounds = np.array(
            [[0.0, data.shape[1] * mpp], [0.0, data.shape[0] * mpp]]
        )


class RollPitchYawLayer(BaseLayer):
    """Uniform Euler ranges -> quaternion xyzw (Layers.py:695-761)."""

    def get_bounds(self):
        cfg = self._layer_cfg
        self._bounds = np.array([
            [cfg.rmin, cfg.rmax], [cfg.pmin, cfg.pmax], [cfg.ymin, cfg.ymax]
        ])

    def sample(self, num=1, **kwargs):
        rpy = self._sampler(num=num, bounds=self._bounds, **kwargs)
        from scipy.spatial.transform import Rotation

        return Rotation.from_euler("xyz", rpy).as_quat()  # xyzw


class LayerFactory:
    def __init__(self):
        self._creators = {}

    def register(self, name, cls):
        self._creators[name] = cls

    def get(self, layer_cfg, sampler_cfg, **kwargs):
        name = layer_cfg.__class__.__name__
        if name not in self._creators:
            raise ValueError(f"Unknown layer requested: {name}")
        return self._creators[name](layer_cfg, sampler_cfg)


Layer_Factory = LayerFactory()
Layer_Factory.register("Line_T", LineLayer)
Layer_Factory.register("Circle_T", CircleLayer)
Layer_Factory.register("Plane_T", PlaneLayer)
Layer_Factory.register("Disk_T", DiskLayer)
Layer_Factory.register("Polygon_T", PolygonLayer)
Layer_Factory.register("Cube_T", CubeLayer)
Layer_Factory.register("Sphere_T", SphereLayer)
Layer_Factory.register("Cylinder_T", CylinderLayer)
Layer_Factory.register("Cone_T", ConeLayer)
Layer_Factory.register("Torus_T", TorusLayer)
Layer_Factory.register("Image_T", ImageLayer)
Layer_Factory.register("RollPitchYaw_T", RollPitchYawLayer)
