from mobilesuperresolution_tpu.train.losses import l1_loss, charbonnier_loss
from mobilesuperresolution_tpu.train.state import (
    TrainState,
    create_train_state,
    multistep_adam,
)
from mobilesuperresolution_tpu.train.checkpoint import CheckpointManager
