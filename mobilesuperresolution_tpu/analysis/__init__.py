from mobilesuperresolution_tpu.analysis.patch_stats import (
    load_patch_stats,
    summarize_patch_stats,
    plot_patch_stats,
)
