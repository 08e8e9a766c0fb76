from .mesh import make_mesh, mesh_axis_size
from .sharding import (
    dit_param_specs,
    t5_param_specs,
    shard_params,
    shard_pipeline_params,
)

__all__ = [
    "make_mesh",
    "mesh_axis_size",
    "dit_param_specs",
    "t5_param_specs",
    "shard_params",
    "shard_pipeline_params",
]
