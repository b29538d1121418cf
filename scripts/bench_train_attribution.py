"""Roofline attribution of the TRAINING steps (VERDICT r3 item 6).

Breaks the canonical train-step times (DESIGN.md "Measured training
throughput") into components and measures the obvious levers, on the real
chip at the reference's canonical train shapes:

- VSR (BasicVSR 24/8 x4, bf16, B=4, T=10, 64->256):
  * full train step (fwd + bwd + masked Adam) — the production step body
  * forward only (loss value)
  * SpyNet flows forward alone, and the forward with flows precomputed
    -> isolates the SpyNet forward share
  * full step with stop_flow_grad   -> the torch-parity lever: SpyNet is
    frozen (train_video_superresolution.py:160-163) so flow cotangents are
    pure waste; torch skips that backward via requires_grad=False
    (models/basicvsr.py::stop_flow_grad — gradients to every trainable
    param are identical, tests/test_models_vsr.py)
  * step under scan unroll variants (backward schedule lever)
  * step with remat, and remat+stop_flow_grad (the long-clip configuration)
- NAS search (16x32 x2, measured v5e table, B=16, 48->96):
  * full step vs forward-only -> bwd/fwd split
- SISR pretrain (BASIC 16x24 x2, B=16, 48->96): full step vs forward.

MEASUREMENT RULE (DESIGN.md preamble): the dev backend is tunneled —
per-dispatch wall timing is meaningless (~30 ms RTT, async dispatch,
block_until_ready can return early). Every number here iterates the EXACT
production step body (train/steps.py ``step.body``) K times inside ONE
compiled ``lax.fori_loop`` carrying (params, opt_state, step), syncs by
device_get of a scalar reduced from the final carry, and divides by K.
Batches are made loop-dependent (``+ k*1e-12`` in the input dtype) so XLA
cannot hoist loop-invariant compute.

Prints one JSON dict; the numbers land in DESIGN.md ("Training
attribution"). Run on an idle chip.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(out):
    """Force a real device sync — device_get of a scalar; block_until_ready
    can return early on the tunneled dev backend (kernels/timing.py)."""
    jax.block_until_ready(out)
    np.asarray(jax.device_get(out)).ravel()[:1]


_FLOOR_MS = None


def dispatch_floor_ms():
    """Measured wall cost of dispatching + syncing a near-empty program —
    the per-measurement tunnel floor, subtracted from every loop total."""
    global _FLOOR_MS
    if _FLOOR_MS is None:
        nop = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0)
        _sync(nop(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(nop(x))
            ts.append(time.perf_counter() - t0)
        _FLOOR_MS = 1e3 * float(np.min(ts))
    return _FLOOR_MS


def time_loop(loop_fn, *args, iters, reps=3, warmup=1):
    """Wall ms per iteration of a pre-jitted loop program returning a scalar,
    with the per-dispatch tunnel floor subtracted from the loop total."""
    _sync(loop_fn(*args))  # compile + first run
    for _ in range(warmup):
        _sync(loop_fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(loop_fn(*args))
        ts.append(time.perf_counter() - t0)
    total = max(1e3 * float(np.min(ts)) - dispatch_floor_ms(), 0.0)
    return round(total / iters, 3)


def _carry_scalar(carry):
    """Scalar data-dependent on the updated params (so no update is dead)."""
    leaves = jax.tree_util.tree_leaves(carry[0])
    return sum(jnp.sum(l.astype(jnp.float32) * 1e-12) for l in leaves)


def time_step_body(body, carry0, lr, hr, apply_fn, tx, iters=8, extra=()):
    """Iterate the production step body inside one compiled fori_loop."""

    @jax.jit
    def loop(carry, lr, hr):
        def b(k, c):
            eps = (jnp.asarray(k, jnp.float32) * 1e-12).astype(lr.dtype)
            c2, _ = body(c, (lr + eps, hr), *extra, apply_fn, tx)
            return c2

        c = jax.lax.fori_loop(0, iters, b, carry)
        return _carry_scalar(c)

    return time_loop(loop, carry0, lr, hr, iters=iters)


def time_forward(fwd, params, x, iters=8, out_reduce=None):
    """Iterate a forward fn(params, x)->y inside one fori_loop; the carry is a
    scalar folded back into x so each iteration depends on the last."""
    if out_reduce is None:
        out_reduce = lambda y: jnp.mean(
            jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)
        )

    @jax.jit
    def loop(params, x):
        def b(k, acc):
            y = fwd(params, x + (acc * 1e-12).astype(x.dtype))
            return out_reduce(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, b, jnp.float32(0))

    return time_loop(loop, params, x, iters=iters)


def vsr_attribution(res, iters, smoke=False):
    from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
    from mobilesuperresolution_tpu.models import get_vsr_model
    from mobilesuperresolution_tpu.models.basicvsr import compute_flows
    from mobilesuperresolution_tpu.models.spynet import SpyNet
    from mobilesuperresolution_tpu.train.state import (
        create_train_state,
        vsr_multistep_adam,
    )
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    B, T, PS, SC = (1, 2, 16, 4) if smoke else (4, 10, 64, 4)
    oh = ow = PS * SC
    rng = np.random.default_rng(0)
    lr_clip = jnp.asarray(rng.random((B, T, PS, PS, 3)), jnp.float32)
    hr_clip = jnp.asarray(rng.random((B, T, oh, ow, 3)), jnp.float32)

    def build(**kw):
        m = get_vsr_model("basic", scale=SC, compute_dtype=jnp.bfloat16, **kw)
        v = jax.jit(m.init, static_argnums=(2, 3))(jax.random.key(0), lr_clip, oh, ow)
        mask = spynet_frozen_mask(v["params"])
        tx = vsr_multistep_adam(1e-4, 100, 10, trainable_mask=mask)
        st = create_train_state(m, jax.random.key(0), lr_clip, tx,
                                extra_args=(oh, ow), variables=v)
        return m, st

    def step_ms(**kw):
        m, st = build(**kw)
        step = make_vsr_step(st, (oh, ow))
        carry0 = (st.params, st.opt_state, st.step)
        return time_step_body(step.body, carry0, lr_clip, hr_clip,
                              st.apply_fn, st.tx, iters=iters), (m, st)

    res["vsr_full_step_ms"], (model, state) = step_ms()

    # forward-only (loss value path: full forward producing sr)
    res["vsr_forward_ms"] = time_forward(
        lambda p, x: model.apply({"params": p}, x, oh, ow),
        state.params, lr_clip, iters=iters,
    )
    res["vsr_backward_plus_opt_ms"] = round(
        res["vsr_full_step_ms"] - res["vsr_forward_ms"], 3
    )

    # SpyNet forward share: flows alone, and the forward given flows
    spynet = SpyNet(quantized=False)
    res["vsr_spynet_forward_ms"] = time_forward(
        lambda p, x: compute_flows(
            lambda r, s: spynet.apply({"params": p["spynet"]}, r, s), x
        ),
        state.params, lr_clip.astype(jnp.bfloat16), iters=iters,
    )
    flows_fn = jax.jit(
        lambda p, x: compute_flows(
            lambda r, s: spynet.apply({"params": p["spynet"]}, r, s), x
        )
    )
    flows = jax.block_until_ready(
        flows_fn(state.params, lr_clip.astype(jnp.bfloat16))
    )

    @jax.jit
    def loop_given_flows(p, x, fl):
        def b(k, acc):
            y = model.apply(
                {"params": p}, x + (acc * 1e-12).astype(x.dtype), oh, ow, flows=fl
            )
            return jnp.mean(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, b, jnp.float32(0))

    res["vsr_forward_given_flows_ms"] = time_loop(
        loop_given_flows, state.params, lr_clip, flows, iters=iters
    )

    # levers
    res["vsr_full_step_stop_flow_grad_ms"], _ = step_ms(stop_flow_grad=True)
    res["vsr_full_step_remat_ms"], _ = step_ms(remat=True)
    res["vsr_full_step_remat_stop_flow_grad_ms"], _ = step_ms(
        remat=True, stop_flow_grad=True
    )

    # scan unroll variants (model-construction knob, default 5)
    for unroll in (1, 5, 10):
        import mobilesuperresolution_tpu.models.basicvsr as bv

        orig = bv._scan_propagation

        def patched(num_feat, num_block, remat=False, unroll_=unroll,
                    quantized=False, **kw):
            return orig(num_feat, num_block, remat=remat, unroll=unroll_,
                        quantized=quantized)

        bv._scan_propagation = patched
        try:
            res[f"vsr_full_step_unroll{unroll}_ms"], _ = step_ms(
                stop_flow_grad=True
            )
        finally:
            bv._scan_propagation = orig

    # warp ablation: replace flow_warp with a flow-CONSUMING identity (the
    # +flow*1e-30 keeps SpyNet alive against DCE, costs an elementwise add)
    # — paired with the stop_flow_grad step/forward above, the deltas
    # isolate the warp gather's forward cost and its scatter-add VJP's
    # backward cost. Same-run pairing; ablation-by-substitution keeps the
    # consumer structure intact (the r2 prop-only deletion caveat).
    import mobilesuperresolution_tpu.models.basicvsr as bv

    orig_warp = bv.flow_warp
    bv.flow_warp = lambda x, flow, padding_mode="zeros": (
        x + (flow[..., :1] * 1e-30).astype(x.dtype)
    )
    try:
        res["vsr_full_step_nowarp_ms"], (m_nw, st_nw) = step_ms(
            stop_flow_grad=True
        )
        res["vsr_forward_nowarp_ms"] = time_forward(
            lambda p, x: m_nw.apply({"params": p}, x, oh, ow),
            st_nw.params, lr_clip, iters=iters,
        )
    finally:
        bv.flow_warp = orig_warp
    # paired reference for the ablation (same-run, same config)
    m_w, st_w = build(stop_flow_grad=True)
    res["vsr_forward_stop_flow_grad_ms"] = time_forward(
        lambda p, x: m_w.apply({"params": p}, x, oh, ow),
        st_w.params, lr_clip, iters=iters,
    )
    return res


def search_attribution(res, iters, smoke=False):
    from mobilesuperresolution_tpu.models.wdsr_nas import NASModel
    from mobilesuperresolution_tpu.nas.search import phase_trainable_mask
    from mobilesuperresolution_tpu.nas.speed_estimator import (
        densify_speed_table,
        packaged_table_path,
    )
    from mobilesuperresolution_tpu.nas.speed_loss import SpeedLoss
    from mobilesuperresolution_tpu.train.state import TrainState, multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_search_step

    B, PS, SC, NB, U = (2, 16, 2, 2, 8) if smoke else (16, 48, 2, 16, 32)
    rng = np.random.default_rng(1)
    lr_img = jnp.asarray(rng.random((B, PS, PS, 3)), jnp.float32)
    hr_img = jnp.asarray(rng.random((B, PS * SC, PS * SC, 3)), jnp.float32)
    table = jnp.asarray(
        densify_speed_table(np.load(packaged_table_path("tpu_v5_lite")), max_ch=U)
    )
    model = NASModel(num_blocks=NB, num_residual_units=U, scale=SC)
    params = jax.jit(model.init)(jax.random.key(0), lr_img)["params"]
    mask = phase_trainable_mask(params, "width")
    tx = multistep_adam(1e-3, 100, 10, trainable_mask=mask)
    st = TrainState(step=0, params=params, opt_state=tx.init(params), tx=tx,
                    apply_fn=model.apply)
    sl = SpeedLoss(scale=5.0)
    step = make_search_step(st, sl, speed_table=table)

    carry0 = (st.params, st.opt_state, st.step)
    res["search_full_step_ms"] = time_step_body(
        step.body, carry0, lr_img, hr_img, st.apply_fn, st.tx, iters=iters,
        extra=(jnp.float32(2.0),),
    )
    res["search_forward_ms"] = time_forward(
        lambda p, x: model.apply({"params": p}, x, table)[0],
        st.params, lr_img, iters=iters,
    )
    res["search_backward_plus_opt_ms"] = round(
        res["search_full_step_ms"] - res["search_forward_ms"], 3
    )
    return res


def sisr_attribution(res, iters, smoke=False):
    from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel
    from mobilesuperresolution_tpu.train.state import TrainState, multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_sisr_step

    B, PS, SC = (2, 16, 2) if smoke else (16, 48, 2)
    rng = np.random.default_rng(2)
    lr_img = jnp.asarray(rng.random((B, PS, PS, 3)), jnp.float32)
    hr_img = jnp.asarray(rng.random((B, PS * SC, PS * SC, 3)), jnp.float32)
    model = BasicModel(num_blocks=16, num_residual_units=24, scale=SC,
                       compute_dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), lr_img)["params"]
    tx = multistep_adam(1e-3, 100, 10)
    st = TrainState(step=0, params=params, opt_state=tx.init(params), tx=tx,
                    apply_fn=model.apply)
    step = make_sisr_step(st)
    carry0 = (st.params, st.opt_state, st.step)
    res["sisr_full_step_ms"] = time_step_body(
        step.body, carry0, lr_img, hr_img, st.apply_fn, st.tx, iters=iters
    )
    res["sisr_forward_ms"] = time_forward(
        lambda p, x: model.apply({"params": p}, x), st.params, lr_img,
        iters=iters,
    )
    res["sisr_backward_plus_opt_ms"] = round(
        res["sisr_full_step_ms"] - res["sisr_forward_ms"], 3
    )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_search", action="store_true")
    ap.add_argument("--skip_vsr", action="store_true")
    ap.add_argument("--skip_sisr", action="store_true")
    ap.add_argument("--iters", type=int, default=16,
                    help="train steps per compiled loop")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes — correctness smoke only, not a bench")
    args = ap.parse_args()

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    res = {"device": str(jax.devices()[0]),
           "dispatch_floor_ms": round(dispatch_floor_ms(), 3),
           "iters_per_loop": args.iters}
    if not args.skip_vsr:
        vsr_attribution(res, args.iters, smoke=args.smoke)
    if not args.skip_search:
        search_attribution(res, args.iters, smoke=args.smoke)
    if not args.skip_sisr:
        sisr_attribution(res, args.iters, smoke=args.smoke)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
