from .collective import (
    distributed_pf_step,
    distributed_systematic_resample,
    gather_global,
)
from .mesh import (
    PARTICLE_AXIS,
    THETA_AXIS,
    ibis_state_shardings,
    make_mesh,
    shard_state,
    smc2_state_shardings,
)
from .launch import initialize_distributed, make_global_mesh, process_info
from .sharded import ShardedIBIS, ShardedSMC2

__all__ = [
    "initialize_distributed",
    "make_global_mesh",
    "process_info",
    "THETA_AXIS",
    "PARTICLE_AXIS",
    "make_mesh",
    "shard_state",
    "smc2_state_shardings",
    "ibis_state_shardings",
    "ShardedSMC2",
    "ShardedIBIS",
    "distributed_systematic_resample",
    "distributed_pf_step",
    "gather_global",
]
