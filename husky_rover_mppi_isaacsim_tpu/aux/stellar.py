"""Stellar engine: sun/earth positions over a lunar surface site.

Re-derivation of ``src/stellar/stellar_engine.py:17-297``. The reference
computes alt-az of the Sun/Earth from a lunar lat/lon observer with skyfield
(de421 + lunar frames); skyfield and its ephemeris files are not in this
image, so this engine uses self-contained low-precision analytic ephemerides
(truncated Meeus series):

* Sun direction seen from the Moon ~= geocentric solar direction (the
  Earth-Moon distance is 0.26% of 1 AU; error < 0.2 deg) from the standard
  low-precision solar longitude series;
* Earth direction from the Moon = -(geocentric lunar position), from the
  dominant ELP terms (Meeus ch. 47 main terms, ~0.3 deg);
* selenographic orientation uses the mean-Earth/ synchronous-rotation
  approximation (librations ~7 deg ignored — lighting-grade accuracy).

API mirrors the reference: ``set_lat_lon``, ``set_time``, ``set_time_scale``,
``update(dt)`` with update-interval gating, ``get_alt_az``,
``get_local_position``, ``convert_alt_az_to_quat``.
"""

from __future__ import annotations

import dataclasses
import datetime
import math

import numpy as np
from scipy.spatial.transform import Rotation

AU_M = 1.495978707e11
MOON_DIST_M = 3.844e8


@dataclasses.dataclass
class Date:
    """src/configurations/stellar_engine_confs.py Date."""

    year: int = 2024
    month: int = 5
    day: int = 1
    hour: int = 12
    minute: int = 0


@dataclasses.dataclass
class StellarEngineConf:
    start_date: Date = dataclasses.field(default_factory=Date)
    time_scale: float = 1.0
    update_interval: float = 600.0
    lat: float = -26.0
    lon: float = 46.8


def _julian_day(dt: datetime.datetime) -> float:
    y, m = dt.year, dt.month
    d = (
        dt.day
        + dt.hour / 24.0
        + dt.minute / 1440.0
        + dt.second / 86400.0
    )
    if m <= 2:
        y -= 1
        m += 12
    a = y // 100
    b = 2 - a + a // 4
    return int(365.25 * (y + 4716)) + int(30.6001 * (m + 1)) + d + b - 1524.5


def _sun_ecliptic(jd: float):
    """Low-precision solar ecliptic longitude (rad) and distance (AU)."""
    t = (jd - 2451545.0) / 36525.0
    l0 = math.radians((280.46646 + 36000.76983 * t) % 360.0)
    m = math.radians((357.52911 + 35999.05029 * t) % 360.0)
    c = math.radians(
        (1.914602 - 0.004817 * t) * math.sin(m)
        + (0.019993 - 0.000101 * t) * math.sin(2 * m)
        + 0.000289 * math.sin(3 * m)
    )
    lon = l0 + c
    e = 0.016708634 - 0.000042037 * t
    nu = m + c
    dist = 1.000001018 * (1 - e * e) / (1 + e * math.cos(nu))
    return lon, dist


def _moon_ecliptic(jd: float):
    """Truncated ELP lunar ecliptic lon/lat (rad) and distance (m)."""
    t = (jd - 2451545.0) / 36525.0
    lp = math.radians((218.3164477 + 481267.88123421 * t) % 360.0)  # mean lon
    d = math.radians((297.8501921 + 445267.1114034 * t) % 360.0)    # elongation
    m = math.radians((357.5291092 + 35999.0502909 * t) % 360.0)     # sun anomaly
    mp = math.radians((134.9633964 + 477198.8675055 * t) % 360.0)   # moon anomaly
    f = math.radians((93.2720950 + 483202.0175233 * t) % 360.0)     # arg latitude
    lon = lp + math.radians(
        6.288774 * math.sin(mp)
        + 1.274027 * math.sin(2 * d - mp)
        + 0.658314 * math.sin(2 * d)
        + 0.213618 * math.sin(2 * mp)
        - 0.185116 * math.sin(m)
        - 0.114332 * math.sin(2 * f)
    )
    lat = math.radians(
        5.128122 * math.sin(f)
        + 0.280602 * math.sin(mp + f)
        + 0.277693 * math.sin(mp - f)
        + 0.173237 * math.sin(2 * d - f)
    )
    dist = 1e3 * (
        385000.56
        - 20905.355 * math.cos(mp)
        - 3699.111 * math.cos(2 * d - mp)
        - 2955.968 * math.cos(2 * d)
    )
    return lon, lat, dist


def _ecl_to_vec(lon, lat):
    return np.array([
        math.cos(lat) * math.cos(lon),
        math.cos(lat) * math.sin(lon),
        math.sin(lat),
    ])


class StellarEngine:
    """Sun/Earth alt-az over a lunar site (stellar_engine.py API)."""

    def __init__(self, cfg: StellarEngineConf):
        self.cfg = cfg
        d = cfg.start_date
        self.current_time = datetime.datetime(
            d.year, d.month, d.day, d.hour, d.minute,
            tzinfo=datetime.timezone.utc,
        )
        self.last_update = self.current_time
        self.set_lat_lon(cfg.lat, cfg.lon)

    def set_lat_lon(self, lat: float, lon: float) -> None:
        self.lat = math.radians(lat)
        self.lon = math.radians(lon)

    def set_time(self, date: datetime.datetime) -> None:
        self.current_time = date
        self.last_update = date

    def set_time_scale(self, time_scale: float) -> None:
        self.cfg.time_scale = time_scale

    def update(self, dt: float) -> bool:
        """Advance scaled time; recompute only every ``update_interval``
        (stellar_engine.py:154-175)."""
        self.current_time += datetime.timedelta(
            seconds=dt * self.cfg.time_scale
        )
        delta = (self.current_time - self.last_update).total_seconds()
        if delta >= self.cfg.update_interval:
            self.last_update = self.current_time
            return True
        return False

    # --- geometry ----------------------------------------------------------
    def _body_direction_selenographic(self, body: str):
        """Unit direction + distance of a body in the mean-Earth
        selenographic frame (x toward mean Earth, z lunar north ~ ecliptic
        north under the synchronous approximation)."""
        jd = _julian_day(self.current_time)
        m_lon, m_lat, m_dist = _moon_ecliptic(jd)
        earth_dir_ecl = -_ecl_to_vec(m_lon, m_lat)  # Earth as seen from Moon
        if body == "earth":
            target_ecl, dist = earth_dir_ecl, m_dist
        elif body == "sun":
            s_lon, s_dist = _sun_ecliptic(jd)
            # Sun from Moon = Sun from Earth - Moon from Earth
            sun_vec = _ecl_to_vec(s_lon, 0.0) * s_dist * AU_M
            moon_vec = _ecl_to_vec(m_lon, m_lat) * m_dist
            rel = sun_vec - moon_vec
            dist = float(np.linalg.norm(rel))
            target_ecl = rel / dist
        else:
            raise ValueError(f"unknown body {body!r}")

        # selenographic basis in ecliptic coords (mean-Earth approximation)
        x_sel = earth_dir_ecl / np.linalg.norm(earth_dir_ecl)
        z_sel = np.array([0.0, 0.0, 1.0])
        z_sel = z_sel - x_sel * np.dot(z_sel, x_sel)
        z_sel /= np.linalg.norm(z_sel)
        y_sel = np.cross(z_sel, x_sel)
        rot = np.stack([x_sel, y_sel, z_sel])  # ecliptic -> selenographic
        return rot @ target_ecl, dist

    def get_alt_az(self, body: str):
        """(alt deg, az deg, distance m) of a body over the site
        (stellar_engine.py:91-104)."""
        d_sel, dist = self._body_direction_selenographic(body)
        # site basis: up from lat/lon, north toward +z_sel, east completes
        clat, slat = math.cos(self.lat), math.sin(self.lat)
        clon, slon = math.cos(self.lon), math.sin(self.lon)
        up = np.array([clat * clon, clat * slon, slat])
        north = np.array([-slat * clon, -slat * slon, clat])
        east = np.cross(north, up)
        alt = math.degrees(math.asin(np.clip(np.dot(d_sel, up), -1, 1)))
        az = math.degrees(
            math.atan2(np.dot(d_sel, east), np.dot(d_sel, north))
        ) % 360.0
        return alt, az, dist

    def get_local_position(self, body: str):
        """Cartesian site-frame position (stellar_engine.py:135-152)."""
        alt, az, dist = self.get_alt_az(body)
        return (
            dist * math.cos(math.radians(alt)) * math.cos(math.radians(az)),
            dist * math.cos(math.radians(alt)) * math.sin(math.radians(az)),
            dist * math.sin(math.radians(alt)),
        )

    @staticmethod
    def convert_alt_az_to_quat(alt: float, az: float):
        """Quaternion (w, x, y, z) rotating a [0, 0, -1] light to the alt/az
        (stellar_engine.py:177-193)."""
        x, y, z, w = Rotation.from_euler(
            "xyz", [0, alt, az - 90], degrees=True
        ).as_quat()
        return (w, x, y, z)
