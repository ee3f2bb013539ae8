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


def test_camera_depth_matches_flat_plane_geometry(tmp_path):
    """Pinhole raycast depth on a flat plane matches the closed form: a
    camera at height h pitched down by p sees, at image row v, depth
    s = h / (cos(a) * tan(p + atan((v - cy)/fy)) ) ... verified via the
    exact per-ray formula s = h / (-d_world_z) for unit-image-plane rays
    (depth-vs-pose consistency, VERDICT r04 next #7)."""
    from husky_rover_mppi_isaacsim_tpu.aux.labeling import (
        CameraIntrinsics,
        camera_pose_from_rover,
        camera_raycast,
    )
    import jax.numpy as jnp

    z = np.zeros((200, 200), np.float32)  # flat plane z = 0, 0.25 m/px
    res = 0.25
    origin = (-25.0, -25.0)
    intr = CameraIntrinsics(width=64, height=48, focal_length=24.0)
    cam_pos, cam_R = camera_pose_from_rover(
        (0.0, 0.0), (1.0, 0.0), 0.0, mount_height=1.0, pitch_deg=25.0)
    depth, hx, hy, hit = camera_raycast(
        jnp.asarray(z), res, origin, jnp.asarray(cam_pos),
        jnp.asarray(cam_R), intr.fx, intr.fy, intr.cx, intr.cy,
        width=intr.width, height=intr.height, steps=512, max_range=30.0)
    depth = np.asarray(depth)
    hit = np.asarray(hit)
    # analytic expected depth per pixel: ray p_z(s) = h + s * dz = 0
    u = (np.arange(intr.width) - intr.cx) / intr.fx
    v = (np.arange(intr.height) - intr.cy) / intr.fy
    d_cam = np.stack(np.broadcast_arrays(
        u[None, :], v[:, None], np.ones((1, 1))), axis=-1)
    d_world = np.einsum("ij,hwj->hwi", cam_R, d_cam)
    expected = np.where(d_world[..., 2] < -1e-6,
                        1.0 / np.maximum(-d_world[..., 2], 1e-9), np.inf)
    m = hit & np.isfinite(expected) & (expected < 25.0)
    assert m.sum() > 500
    np.testing.assert_allclose(depth[m], expected[m], rtol=0.02)
    # hit points project back through the pose consistently: re-derived
    # image-plane depth from the world hit point equals the reported depth
    pts = np.stack([np.asarray(hx), np.asarray(hy),
                    np.zeros_like(depth)], axis=-1)
    rel = pts - cam_pos
    s_check = np.einsum("hwi,i->hw", rel, cam_R[:, 2])
    np.testing.assert_allclose(s_check[m], depth[m], rtol=0.02, atol=0.01)


def test_camera_semantic_sees_rock(tmp_path):
    """A rock placed ahead of the rover shows up in the camera-frame
    semantic mask, and the recorder writes intrinsics alongside poses."""
    from husky_rover_mppi_isaacsim_tpu.aux.labeling import CameraIntrinsics

    z = np.zeros((200, 200), np.float32)
    al = AutonomousLabeling(LabelingConf(data_dir=str(tmp_path)))
    frame = al.record_camera(
        z, resolution=0.25, origin=(-25.0, -25.0),
        rover_xy=(0.0, 0.0), heading_xy=(1.0, 0.0), ground_z=0.0,
        intrinsics=CameraIntrinsics(width=64, height=48),
        rock_xy=np.array([[4.0, 0.0]]), rock_radius=np.array([0.8]),
        steps=256, max_range=30.0,
    )
    sem = np.asarray(frame["semantic"])
    assert (sem == 2).sum() > 10, "rock not visible in camera semantics"
    assert (sem == 1).sum() > 100, "ground not visible"
    files = [f.name for f in al.run_dir.iterdir()]
    assert any(f.startswith("camera_") and f.endswith(".json")
               for f in files)
    assert any(f.startswith("cam_depth") for f in files)
    import json as _json

    cam = _json.loads(
        (al.run_dir / "camera_00000.json").read_text())
    assert cam["intrinsics"]["fx"] > 0 and len(cam["rotation"]) == 3


def test_hillshade_cast_shadows_darken_crater_floor():
    """At low sun elevation the floor of a crater-like pit falls into cast
    shadow (darker than the Lambertian-only shade); at high sun it does
    not (VERDICT r04 next #8)."""
    from husky_rover_mppi_isaacsim_tpu.aux.labeling import (
        cast_shadow_mask,
        hillshade_shadowed,
    )
    import jax.numpy as jnp

    n = 128
    res = 0.5
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    r = np.hypot(xx - n / 2, yy - n / 2) * res
    z = np.where(r < 8.0, -4.0 * (1 - (r / 8.0) ** 2), 0.0).astype(np.float32)

    low_sun = jnp.asarray([1.0, 0.0, 0.12])
    high_sun = jnp.asarray([1.0, 0.0, 2.5])
    mask_low = np.asarray(cast_shadow_mask(jnp.asarray(z), res, low_sun))
    mask_high = np.asarray(cast_shadow_mask(jnp.asarray(z), res, high_sun))
    floor = r < 4.0
    assert mask_low[floor].mean() > 0.5, "low sun must shadow the pit floor"
    assert mask_high[floor].mean() < 0.1, "high sun must not"
    img_low = np.asarray(hillshade_shadowed(jnp.asarray(z), res, low_sun))
    img_high = np.asarray(hillshade_shadowed(jnp.asarray(z), res, high_sun))
    assert img_low[floor].mean() < img_high[floor].mean()


def test_camera_rocks_occlude_terrain():
    """Rock impostors OCCLUDE: where the camera sees a rock, depth is
    strictly nearer than the rock-free terrain render at the same pixels,
    the analytic sphere depth matches, and instance ids follow the rock."""
    from husky_rover_mppi_isaacsim_tpu.aux.labeling import (
        CameraIntrinsics,
        camera_pose_from_rover,
        render_camera_frame,
    )

    z = np.zeros((200, 200), np.float32)  # flat plane, 0.25 m/px
    res, origin = 0.25, (-25.0, -25.0)
    intr = CameraIntrinsics(width=64, height=48)
    cam_pos, cam_R = camera_pose_from_rover(
        (0.0, 0.0), (1.0, 0.0), 0.0, mount_height=0.8, pitch_deg=10.0)
    common = dict(resolution=res, origin=origin, cam_pos=cam_pos,
                  cam_R=cam_R, intrinsics=intr, steps=512, max_range=30.0)
    bare = render_camera_frame(z, **common)
    rocky = render_camera_frame(
        z, rock_xy=np.array([[4.0, 0.0], [8.0, 1.0]]),
        rock_radius=np.array([0.6, 0.9]), **common)
    sem = np.asarray(rocky["semantic"])
    d_bare = np.asarray(bare["depth"])
    d_rock = np.asarray(rocky["depth"])
    inst = np.asarray(rocky["instance"])
    rock_px = sem == 2
    assert rock_px.sum() > 20, "rocks not visible"
    # occlusion: every rock pixel is strictly nearer than the terrain-only
    # render there (sphere tops sit above the ground intersection)
    assert (d_rock[rock_px] < d_bare[rock_px] - 1e-3).all()
    # the near rock's closest pixel is at ~|cam->sphere| - r, along the ray
    c = np.array([4.0, 0.0, 0.0])
    closest = np.linalg.norm(c - cam_pos) - 0.6
    assert d_rock[inst == 1].min() == pytest.approx(closest, rel=0.05)
    # both rocks label distinct instances, and the far rock is farther
    assert set(np.unique(inst[rock_px])) == {1, 2}
    assert d_rock[inst == 2].min() > d_rock[inst == 1].min()
    # depth, semantic and instance agree: no rock id outside rock semantics
    assert (inst[~rock_px] == 0).all()
