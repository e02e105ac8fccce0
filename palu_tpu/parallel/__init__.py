from .mesh import make_mesh, param_shardings, cache_shardings, shard_tree  # noqa: F401
