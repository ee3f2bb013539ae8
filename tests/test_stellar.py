"""Stellar-engine accuracy pinned against tabulated ephemeris epochs.

The reference's ground truth is skyfield + de421 (stellar_engine.py:120-297);
skyfield is not in this image, so accuracy is bounded against astronomical
alignment epochs whose geometry is exact by definition:

* total solar eclipse 2024-04-08 18:18 UTC — Moon between Sun and Earth:
  from the Moon the Sun stands at the zenith of the far-side center
  (0°, 180°) and at the nadir of the sub-earth point (0°, 0°);
* total lunar eclipse 2025-03-14 06:59 UTC — Earth between Sun and Moon:
  the Sun stands at the sub-earth zenith;
* first quarter 2024-04-15 19:13 UTC — the Sun is 90° from the Earth
  direction, rising in the east at the sub-earth point (local 6 am);
* lunar perigee 2024-01-13 (356.9 Mm actual) and the 2024 aphelion
  (1.0167 AU, with the Moon ~new so ~0.0026 AU sunward).

Explicit tolerance: 2° at alignment epochs (truncated-series error ~0.3° +
eclipse alignment width ~0.5° + mean-Earth frame). Librations (≤8°) shift
*site-relative* values away from de421 at arbitrary epochs — documented
lighting-grade accuracy — but syzygy alignments constrain the absolute
frame, which is what these pins verify.
"""

import datetime

import numpy as np

from husky_rover_mppi_isaacsim_tpu.aux.stellar import (
    StellarEngine,
    StellarEngineConf,
)

AU_M = 1.495978707e11


def _alt_az(y, mo, d, h, mi, lat, lon, body):
    eng = StellarEngine(StellarEngineConf(lat=lat, lon=lon))
    eng.set_time(
        datetime.datetime(y, mo, d, h, mi, tzinfo=datetime.timezone.utc)
    )
    return eng.get_alt_az(body)


def test_total_solar_eclipse_2024_sun_geometry():
    alt_far, _, _ = _alt_az(2024, 4, 8, 18, 18, 0.0, 180.0, "sun")
    alt_near, _, _ = _alt_az(2024, 4, 8, 18, 18, 0.0, 0.0, "sun")
    assert alt_far > 88.0, alt_far
    assert alt_near < -88.0, alt_near


def test_total_lunar_eclipse_2025_sun_at_subearth_zenith():
    alt, _, _ = _alt_az(2025, 3, 14, 6, 59, 0.0, 0.0, "sun")
    assert alt > 88.0, alt


def test_first_quarter_2024_sun_rises_east_at_subearth():
    alt, az, _ = _alt_az(2024, 4, 15, 19, 13, 0.0, 0.0, "sun")
    assert abs(alt) < 3.0, alt          # on the horizon (local 6 am)
    assert 87.0 < az < 93.0, az         # due east


def test_earth_distance_at_2024_perigee():
    _, _, dist = _alt_az(2024, 1, 13, 10, 35, 0.0, 0.0, "earth")
    # actual perigee distance 362.27 Mm (c.o.m.); truncated ELP ±1 Mm
    assert abs(dist / 1e6 - 362.3) < 2.0, dist / 1e6


def test_sun_distance_at_2024_aphelion_new_moon():
    _, _, dist = _alt_az(2024, 7, 5, 5, 0, 0.0, 0.0, "sun")
    # aphelion 1.0167 AU minus ~0.0026 AU (Moon sunward of Earth at new moon)
    assert abs(dist / AU_M - 1.0141) < 0.002, dist / AU_M


def test_earth_fixed_at_subearth_zenith():
    """Mean-Earth frame: the Earth stands at the (0,0) zenith by construction
    (synchronous rotation; real librations ≤8° are the documented omission)."""
    for epoch in [(2024, 1, 1, 0, 0), (2024, 7, 15, 6, 30), (2025, 3, 1, 12, 0)]:
        alt, _, _ = _alt_az(*epoch, 0.0, 0.0, "earth")
        assert alt > 89.9, (epoch, alt)


def test_sun_motion_rate_one_lunar_day():
    """The sub-solar longitude advances one full turn per synodic month:
    new moon 2024-04-08 -> next new moon 2024-05-08 03:22 returns the Sun to
    the sub-earth nadir."""
    alt0, _, _ = _alt_az(2024, 4, 8, 18, 18, 0.0, 0.0, "sun")
    alt1, _, _ = _alt_az(2024, 5, 8, 3, 22, 0.0, 0.0, "sun")
    assert alt0 < -88.0 and alt1 < -87.0, (alt0, alt1)
    # and half a synodic month later the Sun is at the zenith (full moon
    # 2024-04-23 23:49)
    alt_full, _, _ = _alt_az(2024, 4, 23, 23, 49, 0.0, 0.0, "sun")
    assert alt_full > 84.0, alt_full  # ecliptic latitude of the Moon ~5 deg


def test_quaternion_rotates_light_onto_alt_az():
    """convert_alt_az_to_quat: the returned (w,x,y,z) rotates a -z light
    direction consistently with the alt/az it was built from."""
    from scipy.spatial.transform import Rotation

    for alt, az in [(30.0, 45.0), (75.0, 200.0), (5.0, 350.0)]:
        w, x, y, z = StellarEngine.convert_alt_az_to_quat(alt, az)
        q = np.array([x, y, z, w])
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        v = Rotation.from_quat(q).apply([0.0, 0.0, -1.0])
        # the reference's convention (stellar_engine.py:177-193, euler
        # "xyz" [0, alt, az-90] applied to [0,0,-1]) in closed form:
        a, b = np.radians(alt), np.radians(az - 90.0)
        expected = np.array(
            [-np.sin(a) * np.cos(b), -np.sin(a) * np.sin(b), -np.cos(a)]
        )
        np.testing.assert_allclose(v, expected, atol=1e-12)
