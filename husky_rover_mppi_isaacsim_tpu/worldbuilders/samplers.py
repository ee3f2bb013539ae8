"""Samplers: randomized draws over a layer's randomization space.

Re-derivation of ``WorldBuilders/Samplers.py`` (reference :5-839): every
sampler takes its config dataclass, owns a ``np.random.default_rng(seed)``,
supports plain sampling, equation-based rejection (re-drawing until the
layer's boundary check passes), and image-mask-weighted sampling. The cluster
point processes (Matern/Thomas, hardcore variants) return a data-dependent
number of points — they run on host (scene randomization time); the jitted
fixed-capacity equivalents live in ``terrain.point_process``.
"""

from __future__ import annotations

import numpy as np

from . import types as T


class BaseSampler:
    def __init__(self, cfg: T.Sampler_T):
        self._cfg = cfg
        self._rng = (
            np.random.default_rng(cfg.seed) if cfg.seed != -1
            else np.random.default_rng()
        )
        self._check_fn = lambda pts: np.ones(pts.shape[0], dtype=bool)
        self.mask = None
        self.parents_coords = []

    # layer hooks ------------------------------------------------------------
    def set_check_fn(self, fn):
        self._check_fn = fn

    def set_mask(self, mask: np.ndarray, mpp: float):
        """Image-weighted sampling support (Samplers.py:23-30)."""
        self.mask = np.asarray(mask, float)
        self.H, self.W = self.mask.shape
        self.mpp = mpp
        flat = self.mask.flatten()
        self.idx = np.arange(flat.shape[0])
        self.p = flat / flat.sum()

    # dispatch ---------------------------------------------------------------
    def __call__(self, num=1, **kwargs):
        if self._cfg.use_rejection_sampling:
            return self.sample_rejection(num=num, **kwargs)
        if self._cfg.use_image_sampling:
            return self.sample_image(num=num, **kwargs)
        return self.sample(num=num, **kwargs)

    def sample(self, num=1, **kwargs):
        raise NotImplementedError

    def sample_rejection(self, num=1, **kwargs):
        """Re-draw until ``num`` in-boundary points or the loop cap
        (Samplers.py:54-67)."""
        points, total = [], 0
        for _ in range(self._cfg.max_rejection_sampling_loop):
            if total >= num:
                break
            pts = self.sample(num=num, **kwargs)
            ok = self._check_fn(pts)
            if ok.sum():
                points.append(pts[ok])
                total += int(ok.sum())
        return np.concatenate(points)[:num] if points else np.zeros((0, self._cfg.randomization_space))

    def _image_points(self, num):
        """Mask-weighted pixel draw + in-pixel jitter (Samplers.py:69-80).

        NOTE: the row flip ``H - row`` is the reference's own formula and
        disagrees by one row with the clippers' lower-origin inverse
        ``(H-1) - y/mpp`` (Clippers.py:35) — both sides replicate the
        reference verbatim, so mask-sampled points paired with an image
        clipper read the adjacent DEM row exactly as upstream does."""
        idx = self._rng.choice(self.idx, p=self.p, size=num)
        local = self._rng.uniform(0, self.mpp, size=(num, self._cfg.randomization_space))
        y = self.H - idx // self.mask.shape[1]
        x = idx % self.mask.shape[1]
        return np.stack([x, y]).T * self.mpp + local

    def sample_image(self, num=1, **kwargs):
        return self._image_points(num)


class UniformSampler(BaseSampler):
    """Samplers.py:45-80."""

    def sample(self, num=1, **kwargs):
        cfg = self._cfg
        pts = np.stack(
            [self._rng.uniform(cfg.min[d], cfg.max[d], num)
             for d in range(cfg.randomization_space)]
        ).T
        return pts[self._check_fn(pts)]


def _hardcore_reject(rng, coords, core_radius):
    """Age-mark hardcore thinning (Samplers.py:120-133), vectorized."""
    n = coords.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    marks = rng.uniform(0, 1, n)
    dist = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    in_disk = (dist < core_radius) & (dist > 0)
    neighbor_min = np.where(in_disk, marks[None, :], np.inf).min(axis=1)
    return marks < neighbor_min


class HardCoreUniformSampler(BaseSampler):
    """Samplers.py:82-150."""

    def _draw(self, num):
        cfg = self._cfg
        pts = np.stack(
            [self._rng.uniform(cfg.min[d], cfg.max[d], num)
             for d in range(cfg.randomization_space)]
        ).T
        return pts[self._check_fn(pts)]

    def sample(self, num=1, **kwargs):
        pts = self._draw(num)
        for _ in range(self._cfg.num_repeat):
            pts = pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]
            pts = np.concatenate([pts, self._draw(num)])
        pts = pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]
        return pts[:num]


class NormalSampler(BaseSampler):
    """Samplers.py:152-239."""

    def sample(self, num=1, **kwargs):
        pts = self._rng.multivariate_normal(self._cfg.mean, self._cfg.std, num)
        return pts[self._check_fn(pts)]


class MaternClusterPointSampler(BaseSampler):
    """Matern cluster process: Poisson parents on the cluster-radius-extended
    bounds, Poisson-many daughters uniform in a disk/ball around each parent
    (Samplers.py:241-379). Supports the polar ``warp`` option and parent
    inheritance for coupled requests."""

    def get_parents(self, bounds, area=None):
        cfg = self._cfg
        b = np.array(bounds, dtype=float)
        if cfg.warp is not None:
            b = (b.T * np.array(cfg.warp)).T
        b[:, 0] -= cfg.cluster_radius
        b[:, 1] += cfg.cluster_radius
        area_ext = np.prod(b[:, 1] - b[:, 0]) if area is None else area
        n = self._rng.poisson(area_ext * cfg.lambda_parent)
        coords = [b[i, 0] + (b[i, 1] - b[i, 0]) * self._rng.uniform(0, 1, n)
                  for i in range(b.shape[0])]
        return np.stack(coords).T

    def get_daughters(self, parents):
        cfg = self._cfg
        counts = self._rng.poisson(cfg.lambda_daughter, parents.shape[0])
        total = int(counts.sum())
        theta = 2 * np.pi * self._rng.uniform(0, 1, total)
        rho = cfg.cluster_radius * np.sqrt(self._rng.uniform(0, 1, total))
        if cfg.randomization_space == 3:
            phi = 2 * np.pi * self._rng.uniform(0, 1, total)
            local = np.stack([
                np.sin(phi) * np.cos(theta) * rho,
                np.sin(phi) * np.sin(theta) * rho,
                np.cos(phi) * rho,
            ]).T
        else:
            local = np.stack([rho * np.cos(theta), rho * np.sin(theta)]).T
        pts = local + np.repeat(parents, counts, axis=0)
        if cfg.warp is not None:
            pts = pts / np.array(cfg.warp)
        return pts[self._check_fn(pts)]

    def sample(self, num=1, bounds=(), area=None, parents=(), **kwargs):
        if getattr(self._cfg, "inherit_parents", False) and len(parents):
            self.parents_coords = np.asarray(parents)
        else:
            self.parents_coords = self.get_parents(bounds, area=area)
        return self.get_daughters(self.parents_coords)

    def sample_rejection(self, num=1, **kwargs):
        return self.sample(num=num, **kwargs)


class HardCoreMaternClusterPointSampler(MaternClusterPointSampler):
    """Samplers.py:381-482."""

    def sample(self, num=1, bounds=(), area=None, parents=(), **kwargs):
        self.parents_coords = self.get_parents(bounds, area=area)
        pts = self.get_daughters(self.parents_coords)
        for _ in range(self._cfg.num_repeat):
            pts = pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]
            pts = np.concatenate([pts, self.get_daughters(self.parents_coords)])
        return pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]


class ThomasClusterSampler(MaternClusterPointSampler):
    """Thomas process: Gaussian daughters, 6-sigma bound extension
    (Samplers.py:484-618)."""

    def get_parents(self, bounds, area=None):
        cfg = self._cfg
        b = np.array(bounds, dtype=float)
        if cfg.warp is not None:
            b = (b.T * np.array(cfg.warp)).T
        b[:, 0] -= cfg.sigma * 6
        b[:, 1] += cfg.sigma * 6
        area_ext = np.prod(b[:, 1] - b[:, 0]) if area is None else area
        n = self._rng.poisson(area_ext * cfg.lambda_parent)
        coords = [b[i, 0] + (b[i, 1] - b[i, 0]) * self._rng.uniform(0, 1, n)
                  for i in range(b.shape[0])]
        return np.stack(coords).T

    def get_daughters(self, parents):
        cfg = self._cfg
        counts = self._rng.poisson(cfg.lambda_daughter, parents.shape[0])
        total = int(counts.sum())
        dims = [self._rng.normal(0, cfg.sigma, total)
                for _ in range(cfg.randomization_space)]
        local = np.stack(dims).T
        pts = local + np.repeat(parents, counts, axis=0)
        if cfg.warp is not None:
            pts = pts / np.array(cfg.warp)
        return pts[self._check_fn(pts)]


class HardCoreThomasClusterSampler(ThomasClusterSampler):
    """Samplers.py:620-712."""

    def sample(self, num=1, bounds=(), area=None, parents=(), **kwargs):
        self.parents_coords = self.get_parents(bounds, area=area)
        pts = self.get_daughters(self.parents_coords)
        for _ in range(self._cfg.num_repeat):
            pts = pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]
            pts = np.concatenate([pts, self.get_daughters(self.parents_coords)])
        return pts[_hardcore_reject(self._rng, pts, self._cfg.core_radius)]


class PoissonPointSampler(BaseSampler):
    """Homogeneous Poisson process over the layer bounds
    (Samplers.py:714-755)."""

    def sample(self, num=1, bounds=(), area=None, **kwargs):
        b = np.array(bounds, dtype=float)
        area_b = np.prod(b[:, 1] - b[:, 0]) if area is None else area
        n = self._rng.poisson(area_b * self._cfg.lambda_poisson)
        pts = np.stack(
            [self._rng.uniform(b[i, 0], b[i, 1], n) for i in range(b.shape[0])]
        ).T
        return pts[self._check_fn(pts)]


class LinearInterpolationSampler(BaseSampler):
    """Evenly-spaced points min..max (Samplers.py:757-802)."""

    def sample(self, num=1, **kwargs):
        cfg = self._cfg
        return np.stack(
            [np.linspace(cfg.min[d], cfg.max[d], num)
             for d in range(cfg.randomization_space)]
        ).T


class DeterministicSampler(BaseSampler):
    """Replays fixed data points (Samplers.py:804-815)."""

    def sample(self, num=1, **kwargs):
        data = np.asarray(self._cfg.data)
        return data[:num]


class SamplerFactory:
    def __init__(self):
        self._creators = {}

    def register(self, name, cls):
        self._creators[name] = cls

    def get(self, cfg, **kwargs):
        name = cfg.__class__.__name__
        if name not in self._creators:
            raise ValueError(f"Unknown sampler requested: {name}")
        return self._creators[name](cfg)


Sampler_Factory = SamplerFactory()
Sampler_Factory.register("UniformSampler_T", UniformSampler)
Sampler_Factory.register("HardCoreUniformSampler_T", HardCoreUniformSampler)
Sampler_Factory.register("NormalSampler_T", NormalSampler)
Sampler_Factory.register("MaternClusterPointSampler_T", MaternClusterPointSampler)
Sampler_Factory.register(
    "HardCoreMaternClusterPointSampler_T", HardCoreMaternClusterPointSampler
)
Sampler_Factory.register("ThomasClusterSampler_T", ThomasClusterSampler)
Sampler_Factory.register("HardCoreThomasClusterSampler_T", HardCoreThomasClusterSampler)
Sampler_Factory.register("PoissonPointSampler_T", PoissonPointSampler)
Sampler_Factory.register("LinearInterpolationSampler_T", LinearInterpolationSampler)
Sampler_Factory.register("DeterministicSampler_T", DeterministicSampler)
