from mobilesuperresolution_tpu.ops.ste import (
    rounding,
    binary_mask,
    condition,
    mask_active_count,
)
from mobilesuperresolution_tpu.ops.resize import (
    resize_bilinear,
    linear_resize_matrix,
    avg_pool_2x2,
    replicate_pad_hw,
)
from mobilesuperresolution_tpu.ops.warp import flow_warp
from mobilesuperresolution_tpu.ops.layers import (
    WNConv,
    PlainConv,
    depth_to_space,
    space_to_depth,
)
