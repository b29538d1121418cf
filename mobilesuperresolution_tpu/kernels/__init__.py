from mobilesuperresolution_tpu.kernels.timing import (
    time_fn,
    benchmark_split_block,
    build_latency_table,
)
