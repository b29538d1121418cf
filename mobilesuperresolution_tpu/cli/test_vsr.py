"""VSR full-frame eval entry (reference: test_video_superresolution.py —
eval-only driver; adds the 'basic_origin' faithful BasicVSR option)."""

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    load_vsr_eval_params,
    parse_with_plugins,
)
from mobilesuperresolution_tpu.cli.train_vsr import add_vsr_args, run_vsr_evaluation
from mobilesuperresolution_tpu.core import LoggingTool
from mobilesuperresolution_tpu.core.utils import attr_extractor
from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam


def main(argv=None):
    parser = base_parser("VSR full-frame evaluation (TPU)")
    parser.set_defaults(dataset="reds", eval_datasets=["reds"], eval_only=True)
    add_vsr_args(parser)
    params, _ = parse_with_plugins(parser, argv, with_models=False)
    params.eval_only = True
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))

    dtype = jnp.bfloat16 if params.bf16 else jnp.float32
    model = get_vsr_model(
        params.model_type,
        scale=params.scale,
        block_index_path=params.model_path,
        compute_dtype=dtype,
        flow_downscale=getattr(params, "flow_downscale", 1),
        quantized=getattr(params, "quantize", "none") == "int8",
    )
    c_in = 5 if params.model_type == "basic_mv" else 3
    t = params.image_batch
    ps = params.lr_patch_size
    sample = jnp.zeros((1, t, ps, ps, c_in))
    tx = multistep_adam(1e-4, 1, 1)
    state = create_train_state(
        model,
        jax.random.key(params.seed),
        sample,
        tx,
        extra_args=(ps * params.scale, ps * params.scale),
    )
    if params.eval_model:
        state = state.replace(
            params=load_vsr_eval_params(
                params.eval_model, params.model_type, model, state.params
            )
        )

    eval_mods = eval_modules(params)
    run_vsr_evaluation(params, state, model, eval_mods, logging, epoch=0)


if __name__ == "__main__":
    main()
