"""Offline controller evaluation: re-scoring logged runs through the critics.

Re-derivation of ``thesis_master/warp_implementation/evaluate_trajectory.py``
(:11-150) and the statistics of ``stats_results.py`` / ``compare_3d_2d.py``:
logged trajectories are re-scored with the critic stack (one trajectory at a
time, the reference's dim=1 launches), collisions counted against the
costmap, and run populations compared with trimmed means.
"""

from __future__ import annotations

import csv
import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from . import critics as crit
from .critics import Costmap


@dataclasses.dataclass
class TrajectoryLog:
    """One logged run (the reference's CSV schema: step id, XYZ, velocity,
    start, goal — trajectories_data.csv writers in MPPI_OO_current.py)."""

    step: int
    trajectory: np.ndarray          # (T, 3)
    linear_velocities: np.ndarray   # (T,)
    start: tuple
    goal: tuple


def save_trajectory_csv(path, logs):
    """CSV writer mirroring the reference schema."""
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        for log in logs:
            for i, p in enumerate(log.trajectory):
                w.writerow([
                    log.step, p[0], p[1], p[2], log.linear_velocities[i],
                    list(log.start), list(log.goal),
                ])


def load_trajectory_csv(path) -> list[TrajectoryLog]:
    import ast

    runs: dict[int, dict] = {}
    with open(path) as fh:
        for row in csv.reader(fh):
            if not row:
                continue
            step = int(float(row[0]))
            entry = runs.setdefault(step, {"pts": [], "v": [], "start": None,
                                           "goal": None})
            entry["pts"].append([float(row[1]), float(row[2]), float(row[3])])
            entry["v"].append(float(row[4]))
            entry["start"] = tuple(ast.literal_eval(row[5]))
            entry["goal"] = tuple(ast.literal_eval(row[6]))
    return [
        TrajectoryLog(step, np.array(e["pts"]), np.array(e["v"]), e["start"],
                      e["goal"])
        for step, e in sorted(runs.items())
    ]


def rescore_trajectory(
    log: TrajectoryLog, costmap: Costmap, target_speed: float = 2.0,
    horizon_m: float = 9.0, weights: crit.CriticWeights = crit.CriticWeights(),
) -> dict:
    """Critic re-scoring of one logged run (compute_cost,
    evaluate_trajectory.py:11-40): each critic evaluated on the whole
    trajectory with the start position as the robot pose. The wheel-slope
    critic degrades to the body-slope critic (wheel tracks are not logged —
    same fallback the reference uses offline)."""
    traj = jnp.asarray(log.trajectory)
    x, y = log.start
    goal = jnp.asarray(log.goal)
    pf = crit.path_follow_critic(
        jnp.asarray(x), jnp.asarray(y), goal, traj, jnp.asarray(horizon_m)
    )
    slope = crit.avoid_slope_critic(traj)
    speed = crit.maximise_speed_critic(
        jnp.asarray(x), jnp.asarray(y), goal,
        jnp.asarray(log.linear_velocities), jnp.asarray(target_speed),
    )
    obstacle = crit.avoid_obstacle_critic(traj, costmap)
    return {
        "distance": float(pf),
        "slope": float(slope),
        "speed": float(speed),
        "obstacle": float(obstacle),
        "total": float(
            weights.path_follow * pf + weights.slope_wheels * slope
            + weights.speed * speed + weights.obstacle * obstacle
        ),
    }


def count_collisions(log: TrajectoryLog, costmap: Costmap,
                     threshold: float = 0.99) -> int:
    """Waypoints inside collision cells (evaluate_trajectory.py:104-110)."""
    traj = jnp.asarray(log.trajectory)
    ix = jnp.trunc((traj[:, 0] + costmap.half_width) / costmap.resolution)
    iy = jnp.trunc((-traj[:, 1] + costmap.half_width) / costmap.resolution)
    size = costmap.size
    cells = costmap.cost[
        jnp.clip(iy.astype(jnp.int32), 0, size - 1),
        jnp.clip(ix.astype(jnp.int32), 0, size - 1),
    ]
    return int(jnp.sum(cells > threshold))


def trimmed_mean(values, trim_fraction: float = 0.1) -> float:
    """Symmetric trimmed mean (the stats_results.py aggregation)."""
    v = np.sort(np.asarray(values, float))
    k = int(len(v) * trim_fraction)
    core = v[k: len(v) - k] if len(v) > 2 * k else v
    return float(core.mean())


def compare_populations(scores_a, scores_b, trim_fraction: float = 0.1) -> dict:
    """Per-critic trimmed-mean comparison of two run populations (the
    compare_3d_2d.py 2D-vs-3D tables)."""
    keys = scores_a[0].keys()
    out = {}
    for key in keys:
        a = trimmed_mean([s[key] for s in scores_a], trim_fraction)
        b = trimmed_mean([s[key] for s in scores_b], trim_fraction)
        out[key] = {
            "a": a, "b": b,
            "improvement_pct": 100.0 * (a - b) / a if a else 0.0,
        }
    return out


def run_2d_vs_3d_experiment(
    ks=(350, 500, 1000),
    runs_per_arm: int = 8,
    horizon: int = 100,
    max_loops: int = 1500,
    half_width: float = 75.0,
    grid_size: int = 1500,
    costmap_size: int = 750,
    seed: int = 42,
    trim_fraction: float = 0.1,
    dtype=None,
    gather_engine: str = "direct",
    span_fraction: float = 0.8,
) -> dict:
    """The thesis's 2D-vs-3D projection experiment
    (compare_3d_2d.py / stats_results.py:8-80): for each K in ``ks`` run
    ``runs_per_arm`` goal-seek episodes on the regenerated 150 m map +
    750-obstacle costmap with the 3D (surface-riding) and 2D (planar)
    projection, record realized trajectories on device, re-score them
    through the critic stack, count collisions, and emit the per-K
    trimmed-mean comparison table.

    Start/goal pairs are drawn per run from corner-to-corner bands like the
    thesis's ~200 m traverses; both arms share identical pairs and RNG keys
    so the comparison is paired.
    """
    import functools

    import jax

    from ..core.heightfield import HeightField
    from ..terrain import STANDALONE_CRATER_BUMPS, costmap_750, crater_surface
    from .controller import (
        ControllerState,
        MPPIConfig,
        RobotState,
        goal_seek_recorded,
    )

    dtype = dtype or jnp.float32
    z = crater_surface(grid_size, half_width, STANDALONE_CRATER_BUMPS,
                       dtype=dtype)
    hf = HeightField.create(z, half_width, dtype=dtype)
    cm = costmap_750(half_width=half_width, size=costmap_size,
                     use_exact_edt=True)
    cm = cm._replace(cost=cm.cost.astype(dtype),
                     half_width=cm.half_width.astype(dtype),
                     resolution=cm.resolution.astype(dtype))

    rng = np.random.default_rng(seed)
    lim = span_fraction * half_width
    pairs = []
    for _ in range(runs_per_arm):
        start = np.array([-lim, 0.0]) + rng.uniform(-0.15, 0.15, 2) * half_width
        goal = np.array([lim, 0.0]) + rng.uniform(-0.15, 0.15, 2) * half_width
        pairs.append((start, goal))

    table: dict = {"config": {"ks": list(ks), "runs_per_arm": runs_per_arm,
                              "horizon": horizon, "max_loops": max_loops},
                   "per_k": {}}
    import sys
    import time as _time

    # re-scoring is tiny host math; pin it to the CPU backend so per-episode
    # eager ops never round-trip through the TPU relay
    cpu = jax.devices("cpu")[0]
    cm_host = jax.device_put(cm, cpu)

    for k in ks:
        arm_scores = {"3d": [], "2d": []}
        arm_collisions = {"3d": 0, "2d": 0}
        arm_reached = {"3d": 0, "2d": 0}
        for proj in ("3d", "2d"):
            config = MPPIConfig(num_samples=int(k), horizon=horizon,
                                projection=proj, gather_engine=gather_engine)
            runner = jax.jit(functools.partial(
                goal_seek_recorded, config, hf, cm,
                max_loops=max_loops,
            ))
            t_arm = _time.time()
            for run_idx, (start, goal) in enumerate(pairs):
                robot = RobotState.create(
                    start[0], start[1], [1.0, 0.0, 0.0], dtype=dtype
                )
                ctrl = ControllerState.create(config, dtype)
                trace = runner(
                    jnp.asarray(goal, dtype), robot, ctrl,
                    jax.random.key(seed * 1000 + run_idx),
                )
                loops = int(trace.loops)
                log = TrajectoryLog(
                    step=run_idx,
                    trajectory=np.asarray(trace.positions)[:max(loops, 2)],
                    linear_velocities=np.asarray(trace.velocities)[:max(loops, 2)],
                    start=tuple(start),
                    goal=tuple(goal),
                )
                with jax.default_device(cpu):
                    arm_scores[proj].append(rescore_trajectory(log, cm_host))
                    arm_collisions[proj] += count_collisions(log, cm_host)
                arm_reached[proj] += int(trace.reached)
            print(f"[eval] K={k} {proj}: {len(pairs)} runs in "
                  f"{_time.time() - t_arm:.0f}s, reached={arm_reached[proj]}",
                  file=sys.stderr, flush=True)
        table["per_k"][int(k)] = {
            "trimmed_means": compare_populations(
                arm_scores["2d"], arm_scores["3d"], trim_fraction
            ),  # a = 2D, b = 3D; improvement_pct > 0 means 3D is better
            "collisions": dict(arm_collisions),
            "reached": dict(arm_reached),
        }
    return table
