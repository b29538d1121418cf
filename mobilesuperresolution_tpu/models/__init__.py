"""Model registry.

Replaces the reference's ``eval(params.model_type)`` dispatch
(models/__init__.py:31-32) and the VSR entry points' if-chains
(train_video_superresolution.py:243-253) with a registry dict
(SURVEY §7.4 fidelity decision).
"""

import jax.numpy as jnp

from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel
from mobilesuperresolution_tpu.models.wdsr_nas import (
    NASModel,
    get_block_status,
    get_current_blocks,
    get_width_from_block_idx,
)
from mobilesuperresolution_tpu.models.result_net import ResultNet
from mobilesuperresolution_tpu.models.spynet import SpyNet
from mobilesuperresolution_tpu.models.basicvsr import BasicVSR, BasicVSROrigin
from mobilesuperresolution_tpu.models.mvvsr import MotionVectorVSR
from mobilesuperresolution_tpu.models.single_image import SingleImageModel
from mobilesuperresolution_tpu.models.naive_multi import NaiveMultiModel
from mobilesuperresolution_tpu.models.naive_multi_v1 import NaiveMultiModelV1


def update_argparser(parser):
    """SISR model flags (reference models/__init__.py:9-29). The clip_*
    quantization flags are parsed-but-unused in the reference and are omitted."""
    parser.add_argument("--model_type", default="BASIC_MODEL", type=str)
    parser.add_argument("--num_blocks", default=16, type=int)
    parser.add_argument("--num_residual_units", default=24, type=int)
    parser.add_argument("--width_search", action="store_true")
    parser.add_argument("--pretrained", action="store_true",
                        help="Shape-greedy transfer from a pretrained "
                        "WDSR-B checkpoint into the supernet "
                        "(wdsr_b.py:104-105,235-250); needs "
                        "--pretrained_path.")
    parser.add_argument("--pretrained_path", type=str, default=None,
                        help="Reference wdsr_b_x<scale>_<blocks>_<units>"
                        ".pt checkpoint for --pretrained.")
    parser.add_argument("--quantize", choices=["none", "int8"], default="none",
                        help="int8 dynamic-range inference convs (the "
                        "numerics class of the reference's int8 TFLite "
                        "deployment) on the TPU int8 MXU path. "
                        "BASIC_MODEL, --eval_only runs only.")
    parser.set_defaults(image_mean=0.5, num_channels=3)


def get_model(params):
    """Build the SISR model named by params.model_type ('BASIC_MODEL' or
    'NAS_MODEL')."""
    dtype = jnp.bfloat16 if getattr(params, "bf16", False) else jnp.float32
    common = dict(
        num_blocks=params.num_blocks,
        num_residual_units=params.num_residual_units,
        scale=params.scale,
        num_channels=getattr(params, "num_channels", 3),
        image_mean=getattr(params, "image_mean", 0.5),
        compute_dtype=dtype,
    )
    quantized = getattr(params, "quantize", "none") == "int8"
    if quantized and params.model_type != "BASIC_MODEL":
        raise ValueError(
            "--quantize int8 applies to BASIC_MODEL (and ResultNet via "
            "retrain_searched); the NAS supernet trains and must stay float"
        )
    if params.model_type == "BASIC_MODEL":
        return BasicModel(quantized=quantized, **common)
    if params.model_type == "NAS_MODEL":
        return NASModel(
            width_search=getattr(params, "width_search", True),
            differentiable_speed=getattr(params, "differentiable_speed", False),
            **common,
        )
    raise KeyError(f"unknown SISR model_type {params.model_type!r}")


def get_vsr_model(
    model_type,
    scale=4,
    block_index_path=None,
    compute_dtype=jnp.float32,
    flow_downscale=1,
    remat=False,
    quantized=False,
    stop_flow_grad=False,
):
    """Build a VSR model by type string ('single' | 'multi' | 'multi_v1' |
    'basic' | 'basic_mv' | 'basic_origin'), with the reference's canonical sizes
    (train_video_superresolution.py:243-253,
    test_video_superresolution.py:222-235).

    flow_downscale: SpyNet input downscale for the SpyNet-based models
    ('basic', 'basic_origin', 'multi'; 1 = exact reference flows — see
    BasicVSRBase). Rejected for model types that never run SpyNet at
    inference ('single', 'basic_mv', 'multi_v1') rather than silently
    ignored.

    remat: rematerialize each propagation step's trunks in the backward
    pass — O(T) → O(1) activation memory in clip length (SURVEY §5.7; the
    gradients are identical, tested). Only meaningful for the recurrent
    BasicVSR family ('basic', 'basic_mv', 'basic_origin'); rejected for
    the frame-parallel types rather than silently ignored.

    quantized: int8 dynamic-range inference convs (ops/quant.py — the
    numerics class of the reference's int8 TFLite deployment,
    onnx_tflite.py:1-10, on the TPU int8 MXU path): SpyNet + propagation
    trunks for the BasicVSR family, SpyNet + encoder/blocks/decode for
    'multi', the conv body for 'single' (reconstruction convs stay float —
    output-adjacent, small cost share). Opt-in inference-only trade like
    flow_downscale; not implemented for the historical 'multi_v1'.

    stop_flow_grad: training-only — stop gradients at the flow outputs.
    EXACT when SpyNet is frozen (the training CLI's unconditional
    convention, mirroring train_video_superresolution.py:160-163): without
    it JAX differentiates through the whole SpyNet pyramid only for the
    optax mask to zero the result, work torch never does
    (requires_grad=False). Only meaningful for the SpyNet-running types
    ('basic'/'basic_origin'/'multi')."""
    if flow_downscale < 1:
        raise ValueError(f"flow_downscale must be >= 1, got {flow_downscale}")
    if flow_downscale != 1 and model_type not in ("basic", "basic_origin", "multi"):
        raise ValueError(
            f"flow_downscale is only implemented for 'basic'/'basic_origin'/"
            f"'multi', not {model_type!r}: 'single' and 'basic_mv' run no "
            "SpyNet at inference, and 'multi_v1' does not implement it"
        )
    if remat and model_type not in ("basic", "basic_mv", "basic_origin"):
        raise ValueError(
            f"remat applies to the recurrent BasicVSR family "
            f"('basic'/'basic_mv'/'basic_origin'), not {model_type!r} — "
            "'single'/'multi' are frame-parallel (no temporal scan to "
            "rematerialize) and 'multi_v1' does not implement it"
        )
    if quantized and model_type == "multi_v1":
        raise ValueError(
            "quantized int8 inference is not implemented for 'multi_v1' "
            "(historical per-block-carry variant) — use 'multi'"
        )
    if model_type == "single":
        return SingleImageModel(
            scale=scale, channel=32, blocks=8, kernel=3,
            compute_dtype=compute_dtype, quantized=quantized,
        )
    if model_type == "multi":
        if block_index_path is None:
            raise ValueError("'multi' needs block_index_path (search artifact)")
        return NaiveMultiModel.from_artifact(
            block_index_path,
            scale=scale,
            compute_dtype=compute_dtype,
            flow_downscale=flow_downscale,
            quantized=quantized,
            stop_flow_grad=stop_flow_grad,
        )
    if model_type == "multi_v1":
        if block_index_path is None:
            raise ValueError("'multi_v1' needs block_index_path (search artifact)")
        return NaiveMultiModelV1.from_artifact(
            block_index_path, scale=scale, compute_dtype=compute_dtype
        )
    if model_type == "basic":
        return BasicVSR(
            num_feat=24,
            num_block=8,
            scale=scale,
            compute_dtype=compute_dtype,
            flow_downscale=flow_downscale,
            remat=remat,
            quantized=quantized,
            stop_flow_grad=stop_flow_grad,
        )
    if model_type == "basic_mv":
        return MotionVectorVSR(
            num_feat=20, num_block=8, scale=scale, compute_dtype=compute_dtype,
            remat=remat, quantized=quantized,
        )
    if model_type == "basic_origin":
        if scale != 4:
            raise ValueError(
                "basic_origin is the faithful x4 BasicVSR — its "
                "reconstruction is two fixed PixelShuffle(2) stages "
                "(basicvsr_arch_origin.py:85-94), so scale="
                f"{scale} would silently compute at x4 and resample; "
                "use 'basic' for other scales"
            )
        return BasicVSROrigin(
            num_feat=64,
            num_block=30,
            scale=scale,
            compute_dtype=compute_dtype,
            flow_downscale=flow_downscale,
            remat=remat,
            quantized=quantized,
            stop_flow_grad=stop_flow_grad,
        )
    raise KeyError(f"unknown VSR model_type {model_type!r}")
