"""Export CLI (reference: export_onnx.py CLI surface).

Usage:
  python -m mobilesuperresolution_tpu.cli.export \
      --scale 2 --block_index runs/search/block_index.txt \
      --out model --params runs/retrain/weights/models.npz \
      --format stablehlo tflite
"""

import argparse

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.export import (
    export_onnx,
    export_stablehlo,
    export_tflite,
)
from mobilesuperresolution_tpu.models.result_net import ResultNet
from mobilesuperresolution_tpu.train.checkpoint import load_params_npz


def main(argv=None):
    parser = argparse.ArgumentParser("Export a model for deployment")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument(
        "--model_type",
        default="result",
        choices=["result", "basic", "basic_origin", "basic_mv", "single", "multi"],
        help="'result' = the searched SISR net (the reference's only export "
        "path); VSR types export the full recurrent forward (beyond the "
        "reference).",
    )
    parser.add_argument("--block_index", type=str, default=None,
                        help="search artifact (required for result/multi)")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--params", type=str, default=None)
    parser.add_argument(
        "--format", nargs="+", default=["stablehlo"], choices=["stablehlo", "tflite", "onnx"]
    )
    parser.add_argument("--quantize", action="store_true",
                        help="int8 dynamic-range quantization for tflite.")
    # reference export input 1x3x360x540 (export_onnx.py:138-141) — NHWC here
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--width", type=int, default=540)
    parser.add_argument("--frames", type=int, default=10,
                        help="clip length for VSR exports")
    args = parser.parse_args(argv)

    if args.model_type == "result":
        if not args.block_index:
            parser.error("--block_index is required for --model_type result")
        model = ResultNet.from_artifact(args.block_index, scale=args.scale)
        shape = (1, args.height, args.width, 3)
        init_args = (jnp.zeros(shape),)
        apply_fn = model.apply
    else:
        from mobilesuperresolution_tpu.models import get_vsr_model

        if args.model_type == "multi" and not args.block_index:
            parser.error("--block_index is required for --model_type multi")
        model = get_vsr_model(
            args.model_type, scale=args.scale, block_index_path=args.block_index
        )
        c_in = 5 if args.model_type == "basic_mv" else 3
        oh, ow = args.height * args.scale, args.width * args.scale
        shape = (1, args.frames, args.height, args.width, c_in)
        init_args = (jnp.zeros(shape), oh, ow)
        apply_fn = lambda v, x: model.apply(v, x, oh, ow)

    variables = jax.jit(
        model.init, static_argnums=tuple(range(2, 1 + len(init_args)))
    )(jax.random.key(0), *init_args)
    params = variables["params"]
    if args.params:
        params = load_params_npz(args.params, params)

    for fmt in args.format:
        if fmt == "stablehlo":
            p = export_stablehlo(apply_fn, params, shape, args.out + ".stablehlo")
        elif fmt == "onnx":
            if args.model_type != "result":
                parser.error(
                    "--format onnx exports the searched SISR net "
                    "(--model_type result) — the reference's ONNX artifact "
                    "(export_onnx.py:117-141); use stablehlo/tflite for the "
                    "VSR types"
                )
            p = export_onnx(model, params, shape, args.out + ".onnx")
        else:
            p = export_tflite(
                apply_fn, params, shape, args.out + ".tflite", quantize=args.quantize
            )
        print(f"exported {fmt} → {p}")


if __name__ == "__main__":
    main()
