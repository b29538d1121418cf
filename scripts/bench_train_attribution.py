"""Roofline attribution of the TRAINING steps (VERDICT r3 item 6).

Breaks the canonical train-step times (DESIGN.md "Measured training
throughput": VSR 57.2 ms, search 16.8 ms) into components and measures the
obvious levers, on the real chip at the same canonical shapes:

- VSR (BasicVSR 24/8 x4, bf16, B=4, T=10, 64->256):
  * full train step (fwd + bwd + masked Adam)
  * forward only (loss value)
  * forward with flows precomputed  -> isolates SpyNet forward share
  * full step with stop_flow_grad   -> the torch-parity lever: SpyNet is
    frozen (train_video_superresolution.py:160-163) so flow cotangents are
    pure waste; torch skips that backward via requires_grad=False
    (models/basicvsr.py::stop_flow_grad — gradients to every trainable
    param are identical, tests/test_models_vsr.py)
  * step under scan unroll variants (backward schedule lever)
  * step with remat
- NAS search (16x32 x2, measured v5e table, B=16, 48->96):
  * full step vs forward-only -> bwd/fwd split

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


def bench(fn, *args, iters=20, warmup=3):
    """Median wall ms of fn(*args) with blocking."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def vsr_attribution(res):
    from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
    from mobilesuperresolution_tpu.models import get_vsr_model
    from mobilesuperresolution_tpu.models.basicvsr import (
        BasicVSR,
        compute_flows,
    )
    from mobilesuperresolution_tpu.models.spynet import SpyNet
    from mobilesuperresolution_tpu.train.state import (
        TrainState,
        create_train_state,
        vsr_multistep_adam,
    )
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    B, T, PS, SC = 4, 10, 64, 4
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

    model, state = build()
    step = make_vsr_step(state, (oh, ow))

    def run_step(stp, st):
        # fresh state per call set outside; donation means we must rebuild —
        # instead time with donation satisfied by threading the state through
        st, m = stp(st, (lr_clip, hr_clip))
        return st

    # thread state through the timer (donated buffers)
    def timed_step(stp, st, iters=20, warmup=3):
        for _ in range(warmup):
            st, m = stp(st, (lr_clip, hr_clip))
            jax.block_until_ready(m["loss"])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            st, m = stp(st, (lr_clip, hr_clip))
            jax.block_until_ready(m["loss"])
            ts.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(ts))

    res["vsr_full_step_ms"] = timed_step(step, state)

    # forward-only (loss value)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, oh, ow),
                  static_argnums=())
    _, st2 = build()
    res["vsr_forward_ms"] = bench(lambda: fwd(st2.params, lr_clip))
    res["vsr_backward_plus_opt_ms"] = round(
        res["vsr_full_step_ms"] - res["vsr_forward_ms"], 3
    )

    # SpyNet forward share: forward with flows precomputed
    spynet = SpyNet(quantized=False)
    flows_fn = jax.jit(
        lambda p, x: compute_flows(
            lambda r, s: spynet.apply({"params": p["spynet"]}, r, s), x
        )
    )
    flows = jax.block_until_ready(flows_fn(st2.params, lr_clip.astype(jnp.bfloat16)))
    res["vsr_spynet_forward_ms"] = bench(
        lambda: flows_fn(st2.params, lr_clip.astype(jnp.bfloat16))
    )
    fwd_noflow = jax.jit(
        lambda p, x, fl: model.apply({"params": p}, x, oh, ow, flows=fl)
    )
    res["vsr_forward_given_flows_ms"] = bench(
        lambda: fwd_noflow(st2.params, lr_clip, flows)
    )

    # the stop_flow_grad lever
    m_sfg, st_sfg = build(stop_flow_grad=True)
    step_sfg = make_vsr_step(st_sfg, (oh, ow))
    res["vsr_full_step_stop_flow_grad_ms"] = timed_step(step_sfg, st_sfg)

    # remat
    m_r, st_r = build(remat=True)
    res["vsr_full_step_remat_ms"] = timed_step(make_vsr_step(st_r, (oh, ow)), st_r)

    # remat + stop_flow_grad (the long-clip configuration)
    m_rs, st_rs = build(remat=True, stop_flow_grad=True)
    res["vsr_full_step_remat_stop_flow_grad_ms"] = timed_step(
        make_vsr_step(st_rs, (oh, ow)), st_rs
    )

    # scan unroll variants (BasicVSR direct: unroll is a model-construction
    # knob of _scan_propagation, default 5)
    for unroll in (1, 5, 10):
        m_u = BasicVSR(num_feat=24, num_block=8, scale=SC,
                       compute_dtype=jnp.bfloat16)
        # _scan_propagation reads self.remat/unroll via closure default; we
        # monkeypatch the default by rebuilding the scan with this unroll
        import mobilesuperresolution_tpu.models.basicvsr as bv

        orig = bv._scan_propagation

        def patched(num_feat, num_block, remat=False, unroll_=unroll,
                    quantized=False, **kw):
            return orig(num_feat, num_block, remat=remat, unroll=unroll_,
                        quantized=quantized)

        bv._scan_propagation = patched
        try:
            v = jax.jit(m_u.init, static_argnums=(2, 3))(
                jax.random.key(0), lr_clip, oh, ow
            )
            mask = spynet_frozen_mask(v["params"])
            tx = vsr_multistep_adam(1e-4, 100, 10, trainable_mask=mask)
            st_u = TrainState(step=0, params=v["params"],
                              opt_state=tx.init(v["params"]), tx=tx,
                              apply_fn=m_u.apply)
            res[f"vsr_full_step_unroll{unroll}_ms"] = timed_step(
                make_vsr_step(st_u, (oh, ow)), st_u
            )
        finally:
            bv._scan_propagation = orig
    return res


def search_attribution(res):
    from mobilesuperresolution_tpu.models.wdsr_nas import NASModel
    from mobilesuperresolution_tpu.nas.search import phase_trainable_mask
    from mobilesuperresolution_tpu.nas.speed_estimator import (
        densify_speed_table,
        packaged_table_path,
    )
    from mobilesuperresolution_tpu.nas.speed_loss import SpeedLoss
    from mobilesuperresolution_tpu.train.state import TrainState, multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_search_step

    B, PS, SC, NB, U = 16, 48, 2, 16, 32
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

    def timed_step(stp, st, iters=20, warmup=3):
        for _ in range(warmup):
            st, m = stp(st, (lr_img, hr_img), 2.0)
            jax.block_until_ready(m["loss"])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            st, m = stp(st, (lr_img, hr_img), 2.0)
            jax.block_until_ready(m["loss"])
            ts.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(ts))

    res["search_full_step_ms"] = timed_step(step, st)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, table))
    res["search_forward_ms"] = bench(lambda: fwd(params, lr_img))
    res["search_backward_plus_opt_ms"] = round(
        res["search_full_step_ms"] - res["search_forward_ms"], 3
    )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_search", action="store_true")
    ap.add_argument("--skip_vsr", action="store_true")
    args = ap.parse_args()

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    res = {"device": str(jax.devices()[0])}
    if not args.skip_vsr:
        vsr_attribution(res)
    if not args.skip_search:
        search_attribution(res)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
