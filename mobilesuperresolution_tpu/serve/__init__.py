from mobilesuperresolution_tpu.serve.flow_cache import (
    FlowCachedStreamingVSR,
    make_flow_sr_fns,
)
from mobilesuperresolution_tpu.serve.streaming import StreamingVSR

__all__ = ["FlowCachedStreamingVSR", "StreamingVSR", "make_flow_sr_fns"]
