from mobilesuperresolution_tpu.export.export import (
    export_onnx,
    export_stablehlo,
    export_tflite,
)
