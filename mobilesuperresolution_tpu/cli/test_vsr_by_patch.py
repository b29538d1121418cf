"""VSR patch-tiled eval with per-patch total-variation statistics.

Reference: test_video_superresolution_by_patch.py:43-236. Tiles LR frames
into 64x64 patches (overlap_h=4, overlap_w=0), runs the model per patch,
records per-patch-frame [spatial TV, temporal TV, PSNR, bilinear PSNR] and
saves the 4xN array to <job_dir>/run/<model_type>_64_64_2.npy for the
analysis notebook (reference run/test.py).

TPU notes: every 64x64 patch has the same static shape, so ONE jitted
forward (fixed patch-batch, padded) serves every chunk; patches are batched
along the batch dim for MXU occupancy instead of a Python double loop per
patch, and with --data_parallel the patch batch is sharded over the mesh's
'data' axis — patches are independent, so they scale across chips with zero
communication (the device-parallel form of the reference's tiling loop).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    load_vsr_eval_params,
    parse_with_plugins,
)
from mobilesuperresolution_tpu.cli.train_vsr import add_vsr_args
from mobilesuperresolution_tpu.core import LoggingTool, modes
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.metrics import psnr
from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam


def total_variation(clip):
    """clip: (B, T, H, W, C) → (B*T,) anisotropic TV with replicate pad
    (reference :43-53)."""
    b, t, h, w, c = clip.shape
    img = clip.reshape(b * t, h, w, c)
    pad = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    ih = pad[:, 1:, :-1]
    iw = pad[:, :-1, 1:]
    return jnp.sum(jnp.abs(ih - img) + jnp.abs(iw - img), axis=(1, 2, 3))


def time_variation(clip):
    """clip: (B, T, H, W, C) → (B*T,); frame-difference magnitudes spread to
    both endpoint frames, doubled at clip edges (reference :55-69)."""
    b, t = clip.shape[:2]
    d = jnp.sum(jnp.abs(clip[:, 1:] - clip[:, :-1]), axis=(2, 3, 4))  # (B, T-1)
    tv = jnp.zeros((b, t))
    tv = tv.at[:, :-1].add(d)
    tv = tv.at[:, 1:].add(d)
    tv = tv.at[:, 0].multiply(2.0)
    tv = tv.at[:, -1].multiply(2.0)
    return tv.reshape(b * t)


def evaluate_by_patch(
    forward_fn,
    batches,
    scale,
    patch=(64, 64),
    overlap=(4, 0),
    mesh=None,
    patch_batch=None,
):
    """mesh: shard the patch batch over the mesh's 'data' axis — the
    device-parallel form of the reference's per-patch Python loop (patches of
    a clip are independent, so they scale across chips with zero
    communication). patch_batch: patches per jitted forward (padded to a
    fixed size so one program shape serves every chunk); defaults to the
    mesh's data size, or 1 single-device (the reference's per-patch order)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PSpec

    ph, pw = patch
    oh_, ow_ = overlap
    nd = mesh.shape["data"] if mesh is not None else 1
    pb = patch_batch or nd
    pb = -(-pb // nd) * nd  # round up to a multiple of the data axis
    rows = {"space": [], "time": [], "psnr": [], "bilinear": []}
    for name, lr_clip, hr_clip in batches:
        lr_clip = jnp.asarray(lr_clip)
        hr_clip = jnp.asarray(hr_clip)
        b, t = lr_clip.shape[:2]
        positions = []
        start_h = 0
        while start_h + ph <= lr_clip.shape[2]:
            start_w = 0
            while start_w + pw <= lr_clip.shape[3]:
                positions.append((start_h, start_w))
                start_w += pw - ow_
            start_h += ph - oh_
        lps = [
            lr_clip[:, :, sh : sh + ph, sw : sw + pw] for sh, sw in positions
        ]
        # stream chunk by chunk: only one chunk of SR outputs is live at a
        # time (a 100-frame NEMO clip has ~24 patches x (1,100,256,256,3)
        # f32 ~= 1.9 GB if accumulated)
        for i in range(0, len(lps), pb):
            chunk = lps[i : i + pb]
            xs = jnp.concatenate(chunk + [chunk[-1]] * (pb - len(chunk)), axis=0)
            if mesh is not None:
                xs = jax.device_put(xs, NamedSharding(mesh, PSpec("data")))
            srs = forward_fn(xs, ph * scale, pw * scale)
            srs = srs.reshape(pb, b, *srs.shape[1:])[: len(chunk)]
            for (sh, sw), lp, sr in zip(positions[i : i + pb], chunk, srs):
                hp = hr_clip[
                    :,
                    :,
                    sh * scale : (sh + ph) * scale,
                    sw * scale : (sw + pw) * scale,
                ]
                rows["space"].extend(np.asarray(total_variation(lp)).tolist())
                rows["time"].extend(np.asarray(time_variation(lp)).tolist())
                for fi in range(t):
                    base = resize_bilinear(
                        lp[:, fi], (ph * scale, pw * scale), align_corners=False
                    )[..., :3]
                    rows["psnr"].append(float(psnr(sr[:, fi], hp[:, fi], shave=4)))
                    rows["bilinear"].append(
                        float(psnr(base, hp[:, fi], shave=4))
                    )
    return np.stack(
        [
            np.asarray(rows["space"]),
            np.asarray(rows["time"]),
            np.asarray(rows["psnr"]),
            np.asarray(rows["bilinear"]),
        ],
        axis=0,
    )


def main(argv=None):
    parser = base_parser("VSR patch-tiled evaluation (TPU)")
    parser.set_defaults(dataset="reds", eval_datasets=["reds"], eval_only=True)
    add_vsr_args(parser)
    parser.add_argument("--patch_h", type=int, default=64)
    parser.add_argument("--patch_w", type=int, default=64)
    parser.add_argument("--overlap_h", type=int, default=4)
    parser.add_argument("--overlap_w", type=int, default=0)
    parser.add_argument(
        "--data_parallel",
        action="store_true",
        help="shard the patch batch over all devices (mesh 'data' axis)",
    )
    parser.add_argument(
        "--patch_batch",
        type=int,
        default=None,
        help="patches per jitted forward (default: #devices when "
        "--data_parallel, else 1)",
    )
    params, _ = parse_with_plugins(parser, argv, with_models=False)
    logging = LoggingTool(params.job_dir)
    if getattr(params, "chunk_frames", 0):
        # the shared add_vsr_args flag applies to full-frame eval only —
        # reject rather than silently run unchunked
        raise ValueError(
            "--chunk_frames applies to full-frame eval (cli.test_vsr); "
            "patch-tiled eval bounds memory by the patch instead"
        )

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
    sample = jnp.zeros((1, params.image_batch, params.patch_h, params.patch_w, c_in))
    tx = multistep_adam(1e-4, 1, 1)
    state = create_train_state(
        model,
        jax.random.key(params.seed),
        sample,
        tx,
        extra_args=(params.patch_h * params.scale, params.patch_w * params.scale),
    )
    if params.eval_model:
        # shared loader: npz OR reference/mmedit torch .pth (converted per
        # family with geometry checks), same as test_vsr/serve
        state = state.replace(
            params=load_vsr_eval_params(
                params.eval_model, params.model_type, model, state.params
            )
        )

    fwd = jax.jit(
        lambda p, x, oh, ow: model.apply({"params": p}, x, oh, ow),
        static_argnums=(2, 3),
    )
    mesh = None
    if params.data_parallel:
        from mobilesuperresolution_tpu.parallel import make_mesh

        mesh = make_mesh(spatial=1)
        logging.info(f"patch eval sharded over mesh {dict(mesh.shape)}")

    eval_mods = eval_modules(params)
    for name, mod in eval_mods:
        ds = mod.get_dataset(modes.EVAL, params)
        result = evaluate_by_patch(
            lambda x, oh, ow: fwd(state.params, x, oh, ow),
            batch_iterator(ds, 1),
            params.scale,
            patch=(params.patch_h, params.patch_w),
            overlap=(params.overlap_h, params.overlap_w),
            mesh=mesh,
            patch_batch=params.patch_batch,
        )
        out_dir = os.path.join(params.job_dir, "run")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(
            out_dir, f"{params.model_type}_{params.patch_h}_{params.patch_w}_2.npy"
        )
        np.save(out, result)
        logging.info(
            f"{name}: patches={result.shape[1]} "
            f"psnr={result[2].mean():.3f} bilinear={result[3].mean():.3f} → {out}"
        )


if __name__ == "__main__":
    main()
