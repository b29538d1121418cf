from mobilesuperresolution_tpu.kernels.timing import (
    time_fn,
    time_fn_loop,
    benchmark_split_block,
    build_latency_table,
)
