"""Real multi-process multi-host proof (SURVEY §4: multi-host tests runnable
on CPU via ``jax.distributed`` + ``xla_force_host_platform_device_count``).

Two OS processes, 4 virtual devices each, one 8-device global mesh: the
sharded MPPI step must produce exactly the unsharded step's numbers on every
process's addressable shards — the cross-host correctness half of the
BASELINE multi-host target (throughput scaling needs real chips; numerical
equality is hardware-independent)."""

import subprocess
import sys
import socket
from pathlib import Path

WORKER = r'''
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import functools
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from husky_rover_mppi_isaacsim_tpu.core import HeightField
from husky_rover_mppi_isaacsim_tpu.mppi import (
    ControllerState, MPPIConfig, RobotState, mppi_step,
)
from husky_rover_mppi_isaacsim_tpu.parallel.mesh import sharded_mppi_step
from husky_rover_mppi_isaacsim_tpu.terrain import as_costmap, crater_surface

dtype = jnp.float64
hw = 25.0
z = crater_surface(128, hw, [((-5.0, 8.0), 1.5, 8.0)], dtype=dtype)
hf = HeightField.create(z, hw, dtype=dtype)
rng = np.random.default_rng(1)
cm = as_costmap(rng.uniform(0, 0.9, (16, 16)) ** 4, hw, dtype=dtype)
config = MPPIConfig(num_samples=64, horizon=12, exact=True)
goal = jnp.asarray([10.0, 8.0], dtype)
robot = RobotState.create(-9.0, -7.0, [1.0, 0.3, 0.0], dtype=dtype)
ctrl = ControllerState.create(config, dtype)
noise_np = np.random.default_rng(7).normal(
    size=(2, config.num_samples, config.horizon))

mesh = jax.make_mesh((8,), ("sample",))
noise = jax.make_array_from_callback(
    noise_np.shape, NamedSharding(mesh, P(None, "sample", None)),
    lambda idx: noise_np[idx],
)
step = jax.jit(functools.partial(sharded_mppi_step, config, mesh))
new_ctrl, out = step(hf, cm, goal, robot, ctrl, noise)
jax.block_until_ready(out.costs)

# local unsharded reference (identical on both processes)
ref_ctrl, ref_out = mppi_step(config, hf, cm, goal, robot, ctrl,
                              jnp.asarray(noise_np, dtype))
ref_costs = np.asarray(ref_out.costs)

for shard in out.costs.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), ref_costs[shard.index], rtol=1e-12)
# the optimal input sequence is fully replicated after the psum
for shard in new_ctrl.optimal_u1.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), np.asarray(ref_ctrl.optimal_u1), atol=1e-12)
for shard in out.optimal_trajectory.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), np.asarray(ref_out.optimal_trajectory),
        atol=1e-10)
print(f"WORKER_OK {pid}", flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_equality(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    repo = str(Path(__file__).parent.parent)
    env = dict(
        PATH=sys.prefix + "/bin:/usr/bin:/bin",
        PYTHONPATH=repo,
        HOME="/root",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out, out[-3000:]
