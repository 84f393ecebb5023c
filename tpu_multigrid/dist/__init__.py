from .mesh import grid_sharding, make_grid_mesh, place

__all__ = ["make_grid_mesh", "grid_sharding", "place"]
