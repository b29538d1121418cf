from mobilesuperresolution_tpu.nas.speed_estimator import (
    analytic_block_speed,
    block_speed_from_gates,
    get_ori_speed,
    packaged_table_path,
)
from mobilesuperresolution_tpu.nas.speed_loss import SpeedLoss
from mobilesuperresolution_tpu.nas.artifact import (
    append_block_index,
    read_block_index,
)
