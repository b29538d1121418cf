from mobilesuperresolution_tpu.export.export import (
    export_stablehlo,
    export_tflite,
)
