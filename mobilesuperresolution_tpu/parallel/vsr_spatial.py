"""Exact spatially-sharded recurrent VSR (BasicVSR AND BasicVSROrigin) —
the recurrent analog of parallel/halo.py, extending multi-chip spatial
scaling from the pure-conv WDSR family to the flagship VSR pipeline
(reference's only high-resolution mechanism: lossy 64x64 overlap tiling on
one device, test_video_superresolution_by_patch.py:165-226).

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
    BasicVSROrigin,
    _DualTrunk,
    compute_flows,
    lrelu,
    stack_directions,
)
from mobilesuperresolution_tpu.models.spynet import SpyNet
from mobilesuperresolution_tpu.ops.layers import (
    PlainConv,
    SubpixelConvTranspose,
    depth_to_space,
)
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
    (tests/test_parallel_vsr_train.py::test_spatial_vsr_training_matches_plain_step).
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


def _fp_put(arr, mesh, axis):
    """Frame-parallel placement hint: shard leading rows over EVERY mesh
    device when divisible (data × spatial both carry frame work), else over
    the ``axis`` shards alone, else leave placement to XLA's propagation."""
    rest = [None] * (arr.ndim - 1)
    total = mesh.devices.size
    if total > 1 and arr.shape[0] % total == 0:
        return jax.device_put(
            arr, NamedSharding(mesh, P(tuple(mesh.axis_names), *rest))
        )
    if arr.shape[0] % mesh.shape[axis] == 0:
        return jax.device_put(arr, NamedSharding(mesh, P(axis, *rest)))
    return arr


def spatial_basicvsr_forward(
    model,
    params,
    x,
    height,
    width,
    mesh,
    axis="spatial",
    max_disp=8,
    flows=None,
):
    """Spatially-sharded forward of a ``models.basicvsr.BasicVSR`` (mobile
    reconstruction). x: (B, T, H, W, C) with H divisible by the mesh's
    ``axis`` size. Returns (B, T, height, width, C) matching
    ``model.apply({'params': params}, x, height, width)`` exactly whenever
    all flow row displacements are within ``max_disp`` (see module doc).

    Composes with data parallelism: if the mesh also has a ``data`` axis that
    divides B, the batch shards over it (each data row propagates its own
    clips; the spatial halo exchange runs within each data row's spatial
    group), so a (data=D, spatial=S) mesh trains D clips × S height shards
    per step. A non-dividing data axis falls back to replicated compute over
    ``data`` (correct, no speedup).

    Covers both recurrent reconstructions: the mobile ``BasicVSR``
    (fusion → ConvTranspose → resize → +base) and the faithful
    ``BasicVSROrigin`` (fusion → 2x PixelShuffle ladder → conv_hr →
    conv_last → +4x base → resize, basicvsr_arch_origin.py:85-94). The
    propagation stage — where height sharding pays — is byte-identical
    machinery for both (BasicVSRBase._propagate); only the frame-parallel
    reconstruction differs. Note the deep origin trunk (num_block=30) has
    rt = 61: per-step halos reach only adjacent shards, so the shard height
    must satisfy H/n >= rt + max_disp (e.g. 270-row x4 LR frames support
    n=2)."""
    if not isinstance(model, (BasicVSR, BasicVSROrigin)):
        raise TypeError(
            "spatial_basicvsr_forward supports the BasicVSR / BasicVSROrigin "
            f"recurrent models; got {type(model).__name__}"
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
    in_dtype = x.dtype
    x = x.astype(dt)

    # --- 1. flows: frame-parallel SpyNet (both directions, one batch) ------
    # Staging shared with the plain forward (models/basicvsr.py::
    # compute_flows); the hint shards the 2B(T-1) pair batch over the mesh.
    # ``flows`` optionally supplies precomputed (ff, fb) in the same
    # time-major (T-1, B, H, W, 2) layout — the flow-reuse serving path
    # (serve/flow_cache.py composed with --spatial_shards), mirroring
    # BasicVSRBase._flows' pass-through.
    if flows is not None:
        ff, fb = (f.astype(dt) for f in flows)
    else:
        spynet = SpyNet(quantized=model.quantized)
        ff, fb = compute_flows(
            lambda r, s: spynet.apply({"params": params["spynet"]}, r, s),
            x,
            model.flow_downscale,
            pair_hint=lambda r, s: (
                _fp_put(r, mesh, axis),
                _fp_put(s, mesh, axis),
            ),
        )

    # row-displacement budget: samples must stay inside the halo window
    clip = jnp.asarray(max_disp, ff.dtype)
    ff = ff.at[..., 1].set(jnp.clip(ff[..., 1], -clip, clip))
    fb = fb.at[..., 1].set(jnp.clip(fb[..., 1], -clip, clip))

    # --- 2. propagation: direction-stacked scan with per-step halos --------
    frames, flows_seq = stack_directions(x, ff, fb)  # (T, 2B, H, W, ·)
    # split the direction axis out so batch sharding over 'data' keeps each
    # local block's [backward | forward] halves aligned (the trunk reads the
    # first half as the backward leg)
    frames = frames.reshape(t, 2, b, h, w, c)
    flows_seq = flows_seq.reshape(t, 2, b, h, w, 2)
    n_data = dict(mesh.shape).get("data", 1)
    batch_ax = "data" if (n_data > 1 and b % n_data == 0) else None

    trunks_params = params["propagation"]["trunks"]
    trunk = _DualTrunk(nf, nb, quantized=model.quantized)

    def _prop(frames_l, flows_l, tp):
        # local shards: (T, 2, Bloc, hloc, W, ·) → direction-stacked batch
        bloc = frames_l.shape[2]
        frames_l = frames_l.reshape(t, 2 * bloc, hloc, w, c)
        flows_l = flows_l.reshape(t, 2 * bloc, hloc, w, 2)
        mask_rt = _row_mask(hloc, rt, h, axis, dt)
        frames_h = _halo_exchange(frames_l, rt, axis)  # edge halos: zeros
        flows_h = _halo_exchange(flows_l, rt, axis)

        def step(carry, xs):
            x_w, flow_w = xs  # (2Bloc, hloc+2rt, W, ·)
            ch = _halo_exchange(carry, R, axis)  # (2Bloc, hloc+2R, W, nf)
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

        init = jnp.zeros((2 * bloc, hloc, w, nf), dt)
        _, out = jax.lax.scan(step, init, (frames_h, flows_h))
        return out.reshape(t, 2, bloc, hloc, w, nf)

    spec = P(None, None, batch_ax, axis, None, None)
    # check_vma=False: the scan's zero init carry is axis-invariant while the
    # halo-exchanged carry output varies over 'spatial' — intended here
    out = jax.shard_map(
        _prop,
        mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )(frames, flows_seq, trunks_params)  # (T, 2, B, H, W, nf)

    out_b = out[:, 0][::-1]
    out_f = out[:, 1]
    feats = jnp.concatenate(
        [jnp.moveaxis(out_b, 0, 1), jnp.moveaxis(out_f, 0, 1)], axis=-1
    ).reshape(b * t, h, w, 2 * nf)

    # --- 3. reconstruction: frame-parallel over B*T -------------------------
    feats = _fp_put(feats, mesh, axis)
    if isinstance(model, BasicVSROrigin):
        # faithful ladder (models/basicvsr.py::BasicVSROrigin.__call__)
        out = lrelu(PlainConv(nf, 1).apply({"params": params["fusion"]}, feats))
        out = lrelu(depth_to_space(
            PlainConv(nf * 4, 3).apply({"params": params["upconv1"]}, out), 2
        ))
        out = lrelu(depth_to_space(
            PlainConv(64 * 4, 3).apply({"params": params["upconv2"]}, out), 2
        ))
        out = lrelu(PlainConv(64, 3).apply({"params": params["conv_hr"]}, out))
        out = PlainConv(3, 3).apply({"params": params["conv_last"]}, out)
        base = resize_bilinear(
            x.reshape(b * t, h, w, c), (h * 4, w * 4), align_corners=False
        )
        out = resize_bilinear(out + base, (height, width), align_corners=False)
    else:
        out = lrelu(
            PlainConv(2 * nf, 1, use_bias=True).apply(
                {"params": params["fusion"]}, feats
            )
        )
        out = SubpixelConvTranspose(3, kernel_size=5, stride=model.scale).apply(
            {"params": params["conv_last"]}, out, out_hw=(height, width),
            align_corners=False,
        )
        base = resize_bilinear(
            x.reshape(b * t, h, w, c), (height, width), align_corners=False
        )
        out = out + base
    # cast back to the caller's dtype exactly like the plain __call__ — the
    # 'matches the plain forward' contract includes the output dtype under
    # compute_dtype=bfloat16
    return out.reshape(b, t, height, width, c).astype(in_dtype)
