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

from mobilesuperresolution_tpu.export import export_stablehlo, export_tflite
from mobilesuperresolution_tpu.models.result_net import ResultNet
from mobilesuperresolution_tpu.train.checkpoint import load_params_npz


def main(argv=None):
    parser = argparse.ArgumentParser("Export searched model")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--block_index", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--params", type=str, default=None)
    parser.add_argument(
        "--format", nargs="+", default=["stablehlo"], choices=["stablehlo", "tflite"]
    )
    parser.add_argument("--quantize", action="store_true",
                        help="int8 dynamic-range quantization for tflite.")
    # reference export input 1x3x360x540 (export_onnx.py:138-141) — NHWC here
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--width", type=int, default=540)
    args = parser.parse_args(argv)

    model = ResultNet.from_artifact(args.block_index, scale=args.scale)
    shape = (1, args.height, args.width, 3)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros(shape))
    params = variables["params"]
    if args.params:
        params = load_params_npz(args.params, params)

    for fmt in args.format:
        if fmt == "stablehlo":
            p = export_stablehlo(model.apply, params, shape, args.out + ".stablehlo")
        else:
            p = export_tflite(
                model.apply, params, shape, args.out + ".tflite", quantize=args.quantize
            )
        print(f"exported {fmt} → {p}")


if __name__ == "__main__":
    main()
