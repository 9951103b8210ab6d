from .mesh import data_mesh, data_sharding, replicated_sharding

__all__ = ["data_mesh", "data_sharding", "replicated_sharding"]
