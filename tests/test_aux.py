"""Aux subsystems: config composition, stellar engine, SDG labeling."""

import datetime

import numpy as np
import pytest
import yaml

from husky_rover_mppi_isaacsim_tpu.aux import (
    AutonomousLabeling,
    Date,
    LabelingConf,
    StellarEngine,
    StellarEngineConf,
    apply_overrides,
    default_factory,
    hillshade,
    instantiate_configs,
    load_config,
    semantic_mask,
)


def test_load_config_with_defaults_and_overrides(tmp_path):
    (tmp_path / "environment").mkdir()
    (tmp_path / "environment" / "largescale.yaml").write_text(
        "terrain_streamer:\n  block_size: 50.0\n  resolution: 0.05\n"
    )
    (tmp_path / "config.yaml").write_text(
        "defaults:\n  - environment: largescale\nmppi:\n  num_samples: 1000\n"
    )
    tree = load_config(tmp_path / "config.yaml",
                       overrides=["mppi.num_samples=256",
                                  "environment.terrain_streamer.block_size=25.0"])
    assert tree["mppi"]["num_samples"] == 256
    assert tree["environment"]["terrain_streamer"]["block_size"] == 25.0


def test_instantiate_registered_dataclasses():
    tree = {
        "mppi": {"num_samples": 128, "horizon": 50,
                 "limits": {"v_max": 1.5}},
        "terrain_streamer": {"block_size": 50.0, "resolution": 0.05},
        "free_form": {"anything": 1},
    }
    out = instantiate_configs(tree)
    from husky_rover_mppi_isaacsim_tpu.mppi import MPPIConfig
    from husky_rover_mppi_isaacsim_tpu.terrain.streaming import StreamerConf

    assert isinstance(out["mppi"], MPPIConfig)
    assert out["mppi"].num_samples == 128
    assert out["mppi"].limits.v_max == 1.5      # NamedTuple nesting
    assert isinstance(out["terrain_streamer"], StreamerConf)
    assert out["free_form"] == {"anything": 1}


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown keys"):
        instantiate_configs({"mppi": {"not_a_field": 3}})


def test_override_parsing():
    tree = {"a": {"b": 1}}
    apply_overrides(tree, ["a.b=2", "a.c=hello", "d=[1,2]"])
    assert tree == {"a": {"b": 2, "c": "hello"}, "d": [1, 2]}


def test_stellar_engine_geometry():
    eng = StellarEngine(StellarEngineConf(
        start_date=Date(year=2024, month=5, day=1, hour=12, minute=0),
        time_scale=1.0, update_interval=60.0, lat=0.0, lon=0.0,
    ))
    alt_e, az_e, dist_e = eng.get_alt_az("earth")
    # at selenographic (0,0) the Earth is near zenith (librations ignored)
    assert alt_e > 80.0
    assert 3.3e8 < dist_e < 4.4e8
    alt_s, az_s, dist_s = eng.get_alt_az("sun")
    assert -90 <= alt_s <= 90
    assert abs(dist_s - 1.496e11) / 1.496e11 < 0.05
    # local position consistent with alt/az
    x, y, z = eng.get_local_position("sun")
    np.testing.assert_allclose(np.hypot(np.hypot(x, y), z), dist_s, rtol=1e-9)

    # sun moves over a scaled lunar day
    eng.set_time_scale(3600.0)
    assert eng.update(120.0)  # 120 h scaled
    alt_s2, az_s2, _ = eng.get_alt_az("sun")
    assert abs(alt_s2 - alt_s) + abs(az_s2 - az_s) > 1.0


def test_stellar_update_interval_gating():
    eng = StellarEngine(StellarEngineConf(update_interval=100.0, time_scale=1.0))
    assert not eng.update(50.0)
    assert eng.update(60.0)


def test_stellar_quat_unit():
    q = StellarEngine.convert_alt_az_to_quat(30.0, 120.0)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)


def test_labeling_record(tmp_path, rng):
    z = rng.normal(size=(64, 64)).cumsum(axis=0) * 0.1
    rocks = np.array([[1.0, 1.0], [2.5, 2.0]])
    radii = np.array([0.3, 0.5])
    al = AutonomousLabeling(LabelingConf(
        data_dir=str(tmp_path), save_instances=True, save_normals=True,
    ))
    out = al.record(z, resolution=0.1, rock_xy=rocks, rock_radius=radii,
                    pose=np.eye(4))
    assert out["rgb"].shape == (64, 64)
    assert out["rgb"].min() >= 0 and out["rgb"].max() <= 1
    assert set(np.unique(out["semantic"])) <= {1, 2}
    assert out["instance"].max() == 2
    # files written
    files = list(al.run_dir.iterdir())
    assert any(f.suffix == ".npy" for f in files)
    assert any(f.suffix == ".png" for f in files)
    assert any(f.name.startswith("pose") for f in files)


def test_semantic_mask_disk(rng):
    seg = np.asarray(semantic_mask(
        (40, 40), 0.1, (0.0, 0.0), np.array([[2.0, 2.0]]), np.array([0.5])
    ))
    assert seg[20, 20] == 2      # inside the rock
    assert seg[5, 5] == 1        # ground
