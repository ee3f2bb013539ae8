from .mesh import make_mesh, replicate, shard_samples, sharded_mppi_step
from .scaling import (
    initialize_distributed,
    rover_sample_mesh,
    scaling_sweep,
    sharded_multi_rover_step,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_samples",
    "sharded_mppi_step",
    "initialize_distributed",
    "rover_sample_mesh",
    "scaling_sweep",
    "sharded_multi_rover_step",
]
