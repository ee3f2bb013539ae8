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
