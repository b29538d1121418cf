"""VSR full-frame eval entry (reference: test_video_superresolution.py —
eval-only driver; adds the 'basic_origin' faithful BasicVSR option)."""

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    parse_with_plugins,
)
from mobilesuperresolution_tpu.cli.train_vsr import add_vsr_args, run_vsr_evaluation
from mobilesuperresolution_tpu.core import LoggingTool
from mobilesuperresolution_tpu.core.utils import attr_extractor
from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.train.checkpoint import load_params_npz
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
        if params.eval_model.endswith((".pt", ".pth")):
            # reference/mmedit-format torch checkpoint (loaded via the
            # ['params'] key like test_video_superresolution.py:249),
            # converted per model family (train/torch_convert)
            from mobilesuperresolution_tpu.train import torch_convert as tc

            sd = load_torch_checkpoint_any = tc.load_torch_checkpoint(
                params.eval_model
            )
            if "params" in sd and not any(k.startswith("spynet") for k in sd):
                sd = sd["params"]
            if params.model_type == "basic_origin":
                converted, ckpt_blocks = tc.convert_basicvsr_origin_state_dict(sd)
                if ckpt_blocks != model.num_block:
                    raise ValueError(
                        f"checkpoint has {ckpt_blocks} trunk blocks but "
                        f"basic_origin expects {model.num_block}"
                    )
            elif params.model_type == "single":
                converted, ckpt_blocks, ckpt_ch = tc.convert_single_image_state_dict(sd)
                if (ckpt_blocks, ckpt_ch) != (model.blocks, model.channel):
                    raise ValueError(
                        f"checkpoint is a {ckpt_blocks}-block/{ckpt_ch}-ch "
                        f"'single' model; got --num_blocks {model.blocks} "
                        f"channel {model.channel}"
                    )
            elif params.model_type == "multi":
                converted, _ = tc.convert_naive_multi_state_dict(sd)
            elif params.model_type == "basic_mv":
                converted, ckpt_blocks = tc.convert_mvvsr_state_dict(sd)
                if ckpt_blocks != model.num_block:
                    raise ValueError(
                        f"checkpoint has {ckpt_blocks} trunk blocks but "
                        f"basic_mv expects {model.num_block}"
                    )
            else:
                raise ValueError(
                    f"torch checkpoint conversion is not available for "
                    f"{params.model_type!r} (the reference's mobile 'basic' "
                    "variant cannot run in the reference itself — its "
                    "conv_last shape is broadcast-impossible, see "
                    "models/basicvsr.py:19-23); export npz weights instead"
                )
            state = state.replace(params=converted)
        else:
            state = state.replace(
                params=load_params_npz(params.eval_model, state.params)
            )

    eval_mods = eval_modules(params)
    run_vsr_evaluation(params, state, model, eval_mods, logging, epoch=0)


if __name__ == "__main__":
    main()
