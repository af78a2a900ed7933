from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, maybe_init_distributed
from .ring_attention import ring_attention_sharded, ring_flash_attention
from .sharding import param_shardings, shard_params, spec_for_path

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "maybe_init_distributed",
    "param_shardings",
    "ring_attention_sharded",
    "ring_flash_attention",
    "shard_params",
    "spec_for_path",
]
