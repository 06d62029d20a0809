from tmar.core.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_mesh_devices,
)
from tmar.core.precision import Policy, DEFAULT_POLICY, BF16_POLICY

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_mesh_devices",
    "Policy",
    "DEFAULT_POLICY",
    "BF16_POLICY",
]
