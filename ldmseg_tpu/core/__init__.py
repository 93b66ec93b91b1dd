from .config import (
    Config,
    load_config,
    apply_overrides,
    prepare_run_dirs,
    enable_compile_cache,
)
from .mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params_fsdp,
    sp_scope,
    spatial_sharding,
)
from .dtypes import DTypePolicy

__all__ = [
    "Config",
    "load_config",
    "apply_overrides",
    "prepare_run_dirs",
    "enable_compile_cache",
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_params_fsdp",
    "DTypePolicy",
]
