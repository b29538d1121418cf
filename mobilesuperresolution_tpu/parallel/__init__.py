from mobilesuperresolution_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from mobilesuperresolution_tpu.parallel.halo import spatially_sharded_apply
from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply
from mobilesuperresolution_tpu.parallel.distributed import (
    initialize_from_params,
    is_primary,
)

_LAZY = {
    # spatial_train pulls in the whole train stack (optax, steps) — loaded
    # on first use so `from ...parallel import make_mesh` stays lightweight
    "make_spatial_sisr_step": "spatial_train",
    "spatial_sharded_forward": "spatial_train",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(
            f"mobilesuperresolution_tpu.parallel.{_LAZY[name]}"
        )
        return getattr(mod, name)
    raise AttributeError(name)
