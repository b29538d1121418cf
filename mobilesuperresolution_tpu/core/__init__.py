from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.core.meters import AverageMeter, TimeMeter
from mobilesuperresolution_tpu.core.logging_tool import LoggingTool
from mobilesuperresolution_tpu.core.utils import (
    attr_extractor,
    loss_printer,
    SpeedScheduler,
)
