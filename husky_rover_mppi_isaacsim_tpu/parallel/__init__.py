from .mesh import make_mesh, replicate, shard_samples, sharded_mppi_step

__all__ = ["make_mesh", "replicate", "shard_samples", "sharded_mppi_step"]
