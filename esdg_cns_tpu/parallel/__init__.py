from .halo import HaloExchange, build_halo_exchange
from .sharding import (
    make_sharded_cns_rhs,
    make_sharded_euler_rhs,
    make_sharded_rhs,
    partition_specs,
    shard_discretization,
)

__all__ = [
    "HaloExchange",
    "build_halo_exchange",
    "make_sharded_cns_rhs",
    "make_sharded_euler_rhs",
    "make_sharded_rhs",
    "partition_specs",
    "shard_discretization",
]
