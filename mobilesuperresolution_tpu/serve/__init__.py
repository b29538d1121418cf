from mobilesuperresolution_tpu.serve.streaming import StreamingVSR

__all__ = ["StreamingVSR"]
