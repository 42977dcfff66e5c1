from .sharding import shard_discretization

__all__ = ["shard_discretization"]
