"""mobilesuperresolution_tpu — a TPU-native (JAX/XLA/Pallas/pjit) super-resolution
framework with the capabilities of zhuzhui-2000/mobilesuperresolution.

Workload families (see /root/reference for the PyTorch reference, SURVEY.md for the map):

1. Single-image SR (SISR) + compiler-aware NAS: a WDSR-B-style supernet whose
   depth (block skip), width (channel masks) and per-block kernel size {3,5,7}
   are searched by gradient descent against L1 + latency loss, with latency from
   measured TPU kernel timings (reference: search.py, models/wdsr_b.py,
   speed_models/).
2. Video SR (VSR): BasicVSR-style bidirectional recurrent models with SpyNet
   optical flow (reference: train_video_superresolution.py,
   models/basicvsr_arch*.py, models/mvvsr_arch.py).

Design: NHWC layout, bfloat16-friendly compute on the MXU, `lax.scan` temporal
recurrences, `jax.sharding.Mesh` + pjit/shard_map for multi-chip (data-parallel
training, spatially-sharded halo-exchange inference), Pallas kernels for the
fused hot ops.
"""

__version__ = "0.1.0"
