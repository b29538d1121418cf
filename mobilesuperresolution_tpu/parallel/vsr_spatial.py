"""Exact spatially-sharded BasicVSR inference — the recurrent analog of
parallel/halo.py, extending multi-chip spatial scaling from the pure-conv
WDSR family to the flagship VSR pipeline (reference's only high-resolution
mechanism: lossy 64x64 overlap tiling on one device,
test_video_superresolution_by_patch.py:165-226).

Decomposition by the structure of the work (SURVEY §5.7):

1. **SpyNet flows** — frame-parallel (2·B·(T-1) independent image pairs at LR)
   → batch-sharded over the mesh; XLA partitions the convs trivially.
2. **Bidirectional propagation** — sequential in T, conv-local per step
   → frame HEIGHT sharded over the mesh's ``spatial`` axis via ``shard_map``
   with a PER-STEP halo exchange (``lax.ppermute`` over ICI): each scan step
   exchanges ``R = rt + max_disp`` carry rows with its neighbors, warps, and
   runs the trunk on the halo window. ``rt = num_block + 1`` covers the
   trunk's receptive radius; ``max_disp`` bounds the flow's row displacement.
3. **Reconstruction** — frame-parallel (fusion → subpixel transpose → resize
   has no temporal coupling) → batch-sharded over B·T.

Exactness: bit-comparable to the full-frame forward (same params) whenever
every flow's row displacement is within ``max_disp`` — the sharded path
clips flow dy to ±max_disp (flow dx is unlimited: width is not sharded), so
larger motion degrades gracefully toward zero-padding semantics instead of
reading out of the halo. Adjacent-frame motion at 240p is typically 1-3 px;
the default budget of 8 rows is ~4x headroom. True image edges reproduce
full-frame 'SAME' zero padding exactly: ``ppermute`` delivers zero halos at
the mesh boundary and ``_DualTrunk``'s ``row_mask`` re-zeroes out-of-image
rows after every conv (a plain zero halo diverges after one layer —
parallel/halo.py's note).

Verified: tests/test_parallel_vsr.py (8-virtual-device equivalence vs the
plain forward) and ``__graft_entry__.dryrun_multichip``.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mobilesuperresolution_tpu.models.basicvsr import (
    BasicVSR,
    _DualTrunk,
    lrelu,
)
from mobilesuperresolution_tpu.models.spynet import (
    SpyNet,
    downscale_frames,
    flow_downscale_hw,
    upsample_flow,
)
from mobilesuperresolution_tpu.ops.layers import PlainConv, SubpixelConvTranspose
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.ops.warp import flow_warp


def trunk_radius(num_block):
    """Receptive radius of one propagation step's trunk: conv0 3x3 (r=1) +
    num_block residual blocks of two 3x3 convs (r=2 each) —
    models/basicvsr.py::_DualTrunk."""
    return 1 + 2 * num_block


def _halo_exchange(a, m, axis_name):
    """a: (..., Hloc, W, C) → (..., Hloc+2m, W, C). Neighbor rows arrive over
    ICI (ppermute); shards at the mesh boundary receive ZEROS (ppermute's
    semantics for ranks with no source), which is exactly the out-of-image
    value the masked trunk needs."""
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]  # my bottom rows → next's top halo
    up = [(i + 1, i) for i in range(n - 1)]  # my top rows → prev's bottom halo
    top_halo = jax.lax.ppermute(a[..., -m:, :, :], axis_name, down)
    bot_halo = jax.lax.ppermute(a[..., :m, :, :], axis_name, up)
    return jnp.concatenate([top_halo, a, bot_halo], axis=-3)


def _row_mask(hloc, margin, h_total, axis_name, dtype=jnp.float32):
    """(Hloc+2·margin, 1, 1) 0/1 mask: 1 where the padded-window row is a real
    image row (interior shards: all ones; edge shards: zeros beyond the
    image)."""
    i = jax.lax.axis_index(axis_name)
    start = i * hloc - margin
    rows = start + jnp.arange(hloc + 2 * margin)
    return ((rows >= 0) & (rows < h_total)).astype(dtype)[:, None, None]


def make_spatial_vsr_step(state, model, mesh, out_hw, max_disp=8, axis="spatial"):
    """step(state, (lr_clip, hr_clip)) -> (state, metrics): the VSR train step
    (train/steps.py::make_vsr_step — Charbonnier, same optimizer) with the
    forward spatially sharded via ``spatial_basicvsr_forward``.

    The whole sharded forward — halo exchanges (``ppermute``), flow-dy clip,
    row masks — is differentiable, and every output pixel's sharded forward
    equals its full-frame forward whenever flow row displacements stay within
    ``max_disp``, so the Charbonnier loss and the parameter gradients match
    the unsharded step to float tolerance
    (tests/test_parallel_vsr.py::test_spatial_vsr_training_matches_plain_step).
    The flow-dy clip is the one non-smooth addition: at displacements beyond
    the budget its gradient is zero, the correct subgradient of the
    degraded-gracefully forward.

    This is the training analog of the reference's only big-frame mechanism —
    lossy 64x64 eval tiling (test_video_superresolution_by_patch.py:165-226),
    which it never had for training; full frames train across chips here with
    activation memory per device ~ H/n."""
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    oh, ow = out_hw

    def forward(p, lr_clip):
        return spatial_basicvsr_forward(
            model, p, lr_clip, oh, ow, mesh, axis=axis, max_disp=max_disp
        )

    return make_vsr_step(state, out_hw, forward=forward)


def spatial_basicvsr_forward(
    model,
    params,
    x,
    height,
    width,
    mesh,
    axis="spatial",
    max_disp=8,
):
    """Spatially-sharded forward of a ``models.basicvsr.BasicVSR`` (mobile
    reconstruction). x: (B, T, H, W, C) with H divisible by the mesh's
    ``axis`` size. Returns (B, T, height, width, C) matching
    ``model.apply({'params': params}, x, height, width)`` exactly whenever
    all flow row displacements are within ``max_disp`` (see module doc).
    """
    if not isinstance(model, BasicVSR):
        raise TypeError(
            "spatial_basicvsr_forward supports the mobile BasicVSR "
            f"reconstruction; got {type(model).__name__}"
        )
    n = mesh.shape[axis]
    b, t, h, w, c = x.shape
    nf, nb = model.num_feat, model.num_block
    rt = trunk_radius(nb)
    R = rt + max_disp
    if h % n != 0:
        raise ValueError(f"H={h} not divisible by {n} spatial shards")
    hloc = h // n
    if n > 1 and hloc < R:
        raise ValueError(
            f"shard height {hloc} must be >= trunk radius + max_disp = {R}"
        )
    dt = model.compute_dtype
    x = x.astype(dt)

    # --- 1. flows: frame-parallel SpyNet (both directions, one batch) ------
    fh, fw = flow_downscale_hw(h, w, model.flow_downscale)
    xf = downscale_frames(x, fh, fw)
    x1 = xf[:, :-1].reshape(b * (t - 1), fh, fw, c)
    x2 = xf[:, 1:].reshape(b * (t - 1), fh, fw, c)
    ref = jnp.concatenate([x1, x2], axis=0)
    supp = jnp.concatenate([x2, x1], axis=0)
    if ref.shape[0] % n == 0:
        sh = NamedSharding(mesh, P(axis, None, None, None))
        ref, supp = jax.device_put(ref, sh), jax.device_put(supp, sh)
    flows = upsample_flow(
        SpyNet(quantized=model.quantized).apply({"params": params["spynet"]}, ref, supp),
        h,
        w,
    )
    fb = flows[: b * (t - 1)].reshape(b, t - 1, h, w, 2)
    ff = flows[b * (t - 1) :].reshape(b, t - 1, h, w, 2)
    ff, fb = jnp.moveaxis(ff, 1, 0), jnp.moveaxis(fb, 1, 0)

    # row-displacement budget: samples must stay inside the halo window
    clip = jnp.asarray(max_disp, ff.dtype)
    ff = ff.at[..., 1].set(jnp.clip(ff[..., 1], -clip, clip))
    fb = fb.at[..., 1].set(jnp.clip(fb[..., 1], -clip, clip))

    # --- 2. propagation: direction-stacked scan with per-step halos --------
    xt = jnp.moveaxis(x, 1, 0)  # (T, B, H, W, C)
    dummy = jnp.zeros((1, b, h, w, 2), dt)
    frames = jnp.concatenate([xt[::-1], xt], axis=1)  # (T, 2B, H, W, C)
    flows_seq = jnp.concatenate(
        [
            jnp.concatenate([dummy, fb[::-1]], axis=0),
            jnp.concatenate([dummy, ff], axis=0),
        ],
        axis=1,
    )

    trunks_params = params["propagation"]["trunks"]
    trunk = _DualTrunk(nf, nb, quantized=model.quantized)

    def _prop(frames_l, flows_l, tp):
        # local shards: (T, 2B, hloc, W, ·)
        mask_rt = _row_mask(hloc, rt, h, axis, dt)
        frames_h = _halo_exchange(frames_l, rt, axis)  # edge halos: zeros
        flows_h = _halo_exchange(flows_l, rt, axis)

        def step(carry, xs):
            x_w, flow_w = xs  # (2B, hloc+2rt, W, ·)
            ch = _halo_exchange(carry, R, axis)  # (2B, hloc+2R, W, nf)
            # warp the full R-window; only the central rt-margin rows are
            # consumed (flow rows padded with zeros for the discard margin)
            fp = jnp.pad(flow_w, ((0, 0), (R - rt, R - rt), (0, 0), (0, 0)))
            warped = flow_warp(ch, fp, padding_mode="zeros")
            warped = warped[:, R - rt : R + hloc + rt]
            inp = jnp.concatenate([x_w, warped], axis=-1)
            inp = inp * mask_rt.astype(inp.dtype)  # out-of-image rows = 0
            bb = inp.shape[0] // 2
            y = jnp.concatenate([inp[:bb], inp[bb:]], axis=-1)
            y = trunk.apply({"params": tp}, y, mask_rt)
            feat = jnp.concatenate([y[..., :nf], y[..., nf:]], axis=0)
            new_carry = feat[:, rt : rt + hloc]
            return new_carry, new_carry

        init = jnp.zeros((2 * b, hloc, w, nf), dt)
        _, out = jax.lax.scan(step, init, (frames_h, flows_h))
        return out  # (T, 2B, hloc, W, nf)

    spec = P(None, None, axis, None, None)
    # check_vma=False: the scan's zero init carry is axis-invariant while the
    # halo-exchanged carry output varies over 'spatial' — intended here
    out = jax.shard_map(
        _prop,
        mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )(frames, flows_seq, trunks_params)

    out_b = out[:, :b][::-1]
    out_f = out[:, b:]
    feats = jnp.concatenate(
        [jnp.moveaxis(out_b, 0, 1), jnp.moveaxis(out_f, 0, 1)], axis=-1
    ).reshape(b * t, h, w, 2 * nf)

    # --- 3. reconstruction: frame-parallel over B*T -------------------------
    if (b * t) % n == 0:
        feats = jax.device_put(feats, NamedSharding(mesh, P(axis, None, None, None)))
    out = lrelu(
        PlainConv(2 * nf, 1, use_bias=True).apply({"params": params["fusion"]}, feats)
    )
    out = SubpixelConvTranspose(3, kernel_size=5, stride=model.scale).apply(
        {"params": params["conv_last"]}, out, out_hw=(height, width),
        align_corners=False,
    )
    base = resize_bilinear(
        x.reshape(b * t, h, w, c), (height, width), align_corners=False
    )
    return (out + base).reshape(b, t, height, width, c)
