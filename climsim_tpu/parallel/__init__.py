from .mesh import make_mesh, make_mesh_2d, shard_batch, replicate, \
    data_parallel_step

__all__ = ["make_mesh", "make_mesh_2d", "shard_batch", "replicate",
           "data_parallel_step"]
