from tpuwsi.core.mesh import (
    MeshConfig,
    create_mesh,
    data_sharding,
    replicated_sharding,
    local_mesh,
)
from tpuwsi.core.rng import RngStream, fold_host, make_stream
from tpuwsi.core.precision import Policy, DEFAULT_POLICY, bf16_policy, fp32_policy

__all__ = [
    "MeshConfig",
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "local_mesh",
    "RngStream",
    "fold_host",
    "make_stream",
    "Policy",
    "DEFAULT_POLICY",
    "bf16_policy",
    "fp32_policy",
]
