from .mesh import (
    PARTICLE_AXIS,
    THETA_AXIS,
    ibis_state_shardings,
    make_mesh,
    shard_state,
    smc2_state_shardings,
)
from .sharded import ShardedSMC2

__all__ = [
    "THETA_AXIS",
    "PARTICLE_AXIS",
    "make_mesh",
    "shard_state",
    "smc2_state_shardings",
    "ibis_state_shardings",
    "ShardedSMC2",
]
