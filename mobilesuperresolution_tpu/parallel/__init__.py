from mobilesuperresolution_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from mobilesuperresolution_tpu.parallel.halo import spatially_sharded_apply
from mobilesuperresolution_tpu.parallel.spatial_train import (
    make_spatial_sisr_step,
    spatial_sharded_forward,
)
from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply
