from .mesh import data_mesh, data_sharding, replicated_sharding
from .spatial import SpatialFuser, height_sharding, spatial_mesh
from .tiled import TiledFuser

__all__ = [
    "data_mesh",
    "data_sharding",
    "replicated_sharding",
    "SpatialFuser",
    "height_sharding",
    "spatial_mesh",
    "TiledFuser",
]
