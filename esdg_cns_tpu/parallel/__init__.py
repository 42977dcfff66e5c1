from . import launch
from .ensemble import ensemble
from .halo import (
    HaloExchange,
    HexSlabHalo,
    build_halo_exchange,
    build_hex_slab_halo,
)
from .sharding import (
    make_sharded_cns_rhs,
    make_sharded_euler_rhs,
    make_sharded_euler_rhs_fused,
    make_sharded_rhs,
    partition_specs,
    shard_discretization,
)

__all__ = [
    "ensemble",
    "launch",
    "HaloExchange",
    "HexSlabHalo",
    "build_halo_exchange",
    "build_hex_slab_halo",
    "make_sharded_cns_rhs",
    "make_sharded_euler_rhs",
    "make_sharded_euler_rhs_fused",
    "make_sharded_rhs",
    "partition_specs",
    "shard_discretization",
]
