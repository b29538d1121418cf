"""Training-dynamics parity vs torch (the last correctness axis after forward
parity): line-by-line torch twins of (a) the SISR pretrain step (WDSR-B + L1 +
Adam + MultiStepLR, reference pretrain.py:61-143) and (b) the NAS search step
(supernet + L1 + SpeedLoss with STE gates, reference search.py:34-139,
models/ops.py:7-43, models/wdsr_b.py:405-616), run in lockstep from shared
init on identical batches.

The torch twins are *functional* re-derivations written from the reference's
semantics (raw tensors + torch.nn.functional + torch.optim), the same style as
the forward twins in test_torch_parity.py — they validate that our production
train path (train.state.multistep_adam + train.steps.make_{sisr,search}_step)
reproduces the reference's gradient/optimizer/schedule behavior, including:

- weight-norm gradient coupling (dL/dg and dL/dv of g·v/||v||),
- Adam moment/bias-correction conventions (optax.adam vs torch.optim.Adam),
- MultiStepLR boundary semantics (gamma applies to the update AFTER the
  milestone epoch completes),
- STE gradients through BinaryConv2d-style gates and ConditionFunction,
- the no-grad analytic latency path (gradients reach alphas only via beta2),
- SpeedLoss clamp form and the SpeedScheduler's annealed target.

A silent mismatch in any of these would pass every forward-parity test and
surface only as quietly-worse converged PSNR — exactly what these tests pin.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel  # noqa: E402
from mobilesuperresolution_tpu.models.wdsr_nas import NASModel  # noqa: E402
from mobilesuperresolution_tpu.nas.speed_estimator import get_ori_speed  # noqa: E402
from mobilesuperresolution_tpu.nas.speed_loss import SpeedLoss  # noqa: E402
from mobilesuperresolution_tpu.train.state import (  # noqa: E402
    create_train_state,
    multistep_adam,
)
from mobilesuperresolution_tpu.train.steps import (  # noqa: E402
    make_search_step,
    make_sisr_step,
)


from helpers.torch_twins import (  # noqa: E402
    _TorchSupernetTwin,
    _TorchWdsrTwin,
    _flax_wn_to_torch,
    _wn_conv,
)

class TestWeightNormGradParity:
    """Unit check of the weight-norm gradient coupling: for L = <c, conv(x)>,
    dL/dg and dL/dv must match torch.nn.utils.weight_norm exactly (the g/v
    coupling is where a silent mismatch would corrupt every conv's training)."""

    def test_wnconv_grads_match_torch(self):
        from mobilesuperresolution_tpu.ops.layers import WNConv

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
        cot = rng.standard_normal((2, 8, 8, 7)).astype(np.float32)

        m = WNConv(7, 3, g_init=1.0)
        params = m.init(jax.random.key(0), jnp.asarray(x))["params"]
        # non-trivial g so the coupling term is exercised
        params = dict(params, g=jnp.asarray(rng.uniform(0.5, 2.0, 7), jnp.float32))

        def loss_fn(p):
            return jnp.sum(m.apply({"params": p}, jnp.asarray(x)) * jnp.asarray(cot))

        grads = jax.grad(loss_fn)(params)

        tp = _flax_wn_to_torch(params)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tcot = torch.from_numpy(np.transpose(cot, (0, 3, 1, 2)))
        out = _wn_conv(tx, tp, 3)
        (out * tcot).sum().backward()

        np.testing.assert_allclose(
            np.asarray(grads["g"]), tp["g"].grad.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(grads["v"]),
            tp["v"].grad.numpy().transpose(2, 3, 1, 0),
            rtol=1e-5,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(grads["b"]), tp["b"].grad.numpy(), rtol=1e-5, atol=1e-5
        )


# ---------------------------------------------------------------------------
# SISR pretrain lockstep
# ---------------------------------------------------------------------------


def test_sisr_pretrain_lockstep():
    """60 lockstep steps (6 'epochs' x 10 steps) of WDSR-B pretraining,
    crossing BOTH MultiStepLR milestones (epochs 3 and 5): per-step losses and
    final weights must agree between our production SISR step and the torch
    twin."""
    nb, units, scale, bs, hw = 2, 8, 2, 4, 12
    steps_per_epoch, epochs, lr = 10, 6, 1e-3

    model = BasicModel(num_blocks=nb, num_residual_units=units, scale=scale)
    sample = jnp.zeros((bs, hw, hw, 3), jnp.float32)
    tx = multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(model, jax.random.key(0), sample, tx)
    step = make_sisr_step(state)

    twin = _TorchWdsrTwin(state.params, nb, scale)
    opt = torch.optim.Adam(twin.tensors(), lr=lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[epochs // 2, epochs * 9 // 10], gamma=0.3
    )

    rng = np.random.default_rng(42)
    ours, theirs = [], []
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            lr_img = rng.random((bs, hw, hw, 3), np.float32)
            hr_img = rng.random((bs, scale * hw, scale * hw, 3), np.float32)

            state, metrics = step(state, (jnp.asarray(lr_img), jnp.asarray(hr_img)))
            ours.append(float(metrics["loss"]))

            opt.zero_grad()
            sr = twin.forward(torch.from_numpy(lr_img.transpose(0, 3, 1, 2)))
            loss = (sr - torch.from_numpy(hr_img.transpose(0, 3, 1, 2))).abs().mean()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))
        sched.step()  # per-epoch, as in pretrain.py:268

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-6)
    # final weights: the strongest statement — every optimizer-moment /
    # schedule / gradient detail folded into 60 steps stayed aligned
    final_twin = _TorchWdsrTwin(state.params, nb, scale)  # converts final flax
    for got, want in zip(final_twin.tensors(), twin.tensors()):
        np.testing.assert_allclose(
            got.detach().numpy(), want.detach().numpy(), rtol=1e-3, atol=2e-5
        )


# ---------------------------------------------------------------------------
# NAS search lockstep
# ---------------------------------------------------------------------------


def test_nas_search_lockstep():
    """50 lockstep steps of the NAS search (phase-2 'length' semantics:
    everything trainable) with the SpeedScheduler's annealed target: per-step
    total/l1/speed losses, traced latency, AND the surviving architecture must
    agree with the torch twin."""
    from mobilesuperresolution_tpu.models.wdsr_nas import (
        get_block_status,
        get_width_from_block_idx,
    )

    nb, units, scale, bs, hw = 3, 12, 2, 4, 12
    steps_per_epoch, epochs, lr = 10, 5, 1e-3
    weight_speed = 0.1

    ori = get_ori_speed(nb, units)
    target = ori * 0.4
    speed_loss = SpeedLoss(scale=ori - target)  # search.py:266

    model = NASModel(num_blocks=nb, num_residual_units=units, scale=scale)
    sample = jnp.zeros((bs, hw, hw, 3), jnp.float32)
    tx = multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(model, jax.random.key(1), sample, tx)
    step = make_search_step(state, speed_loss, weight_speed=weight_speed)

    twin = _TorchSupernetTwin(state.params, nb, units, scale)
    opt = torch.optim.Adam(twin.tensors(), lr=lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[epochs // 2, epochs * 9 // 10], gamma=0.3
    )

    # SpeedScheduler annealing (utils/__init__.py:26-41), stepped per epoch
    def annealed_target(epoch, gamma=0.5):
        if epoch > epochs * gamma:
            return target
        return target + (epochs * gamma - epoch) * (ori - target) / (epochs * gamma)

    rng = np.random.default_rng(7)
    for epoch in range(1, epochs + 1):
        tgt = annealed_target(epoch)
        for _ in range(steps_per_epoch):
            lr_img = rng.random((bs, hw, hw, 3), np.float32)
            hr_img = rng.random((bs, scale * hw, scale * hw, 3), np.float32)

            state, metrics = step(state, (jnp.asarray(lr_img), jnp.asarray(hr_img)), tgt)

            opt.zero_grad()
            sr, speed = twin.forward(torch.from_numpy(lr_img.transpose(0, 3, 1, 2)))
            l1 = (sr - torch.from_numpy(hr_img.transpose(0, 3, 1, 2))).abs().mean()
            sp = torch.clamp_min((speed - tgt) / (ori - target), 0).mean() * weight_speed
            loss = l1 + sp
            loss.backward()
            opt.step()

            np.testing.assert_allclose(float(metrics["l1"]), float(l1), rtol=3e-4, atol=1e-6)
            np.testing.assert_allclose(
                float(metrics["speed_loss"]), float(sp), rtol=3e-4, atol=1e-6
            )
            np.testing.assert_allclose(
                float(metrics["speed"]), float(speed), rtol=1e-5, atol=1e-6
            )
        sched.step()

    # the search's OUTPUT — the surviving architecture — must be identical
    want_idx, want_width = twin.surviving_arch()
    got_idx = get_block_status(state.params)
    got_width = get_width_from_block_idx(state.params, got_idx)
    assert got_idx == want_idx
    assert got_width == want_width

    # and the trained gates themselves agree numerically
    final = _TorchSupernetTwin(state.params, nb, units, scale)
    np.testing.assert_allclose(
        final.p["mask_w"].detach().numpy(),
        twin.p["mask_w"].detach().numpy(),
        rtol=1e-3,
        atol=2e-5,
    )
    for i in range(nb):
        for leaf in ("split_w", "alpha", "alpha1", "alpha2"):
            np.testing.assert_allclose(
                final.p[f"block{i}"][leaf].detach().numpy(),
                twin.p[f"block{i}"][leaf].detach().numpy(),
                rtol=1e-3,
                atol=2e-5,
                err_msg=f"block{i}.{leaf}",
            )


# ---------------------------------------------------------------------------
# VSR train lockstep
# ---------------------------------------------------------------------------


def test_vsr_train_lockstep():
    """15 lockstep steps (5 'epochs' x 3) of mobile-BasicVSR training,
    crossing BOTH of the VSR trainer's MultiStepLR milestones (epochs 2 and
    4): per-step Charbonnier losses and final trainable weights must agree
    between our production VSR step (vsr_multistep_adam: betas (0.9, 0.99),
    milestones [E/2, 8E/10], spynet frozen via optax mask — all from
    train_video_superresolution.py:43-53,160-168) and the torch twin, and the
    frozen SpyNet must be bitwise-untouched."""
    from helpers.torch_twins import _TorchBasicVSRTwin

    from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
    from mobilesuperresolution_tpu.models.basicvsr import BasicVSR
    from mobilesuperresolution_tpu.train.state import vsr_multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    nf, nb, t, hw, scale = 8, 1, 3, 64, 4
    steps_per_epoch, epochs, lr = 3, 5, 1e-3
    oh = ow = hw * scale

    model = BasicVSR(num_feat=nf, num_block=nb, scale=scale)
    sample = jnp.zeros((1, t, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(3), sample, oh, ow
    )
    mask = spynet_frozen_mask(variables["params"])
    tx = vsr_multistep_adam(lr, steps_per_epoch, epochs, trainable_mask=mask)
    state = create_train_state(
        model, jax.random.key(3), sample, tx, extra_args=(oh, ow),
        variables=variables,
    )
    step = make_vsr_step(state, (oh, ow))
    spy_init = jax.tree.map(np.asarray, state.params["spynet"])

    twin = _TorchBasicVSRTwin(state.params, nf, nb, scale)
    # the reference's exact VSR optimizer: Adam betas (0.9, 0.99) over the
    # non-spynet param group only, MultiStepLR [E/2, 8E/10]
    opt = torch.optim.Adam(twin.tensors(), lr=lr, betas=(0.9, 0.99))
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[epochs // 2, epochs * 8 // 10], gamma=0.3
    )

    rng = np.random.default_rng(5)
    ours, theirs = [], []
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            lr_clip = rng.random((1, t, hw, hw, 3), np.float32)
            hr_clip = rng.random((1, t, oh, ow, 3), np.float32)

            state, metrics = step(
                state, (jnp.asarray(lr_clip), jnp.asarray(hr_clip))
            )
            ours.append(float(metrics["loss"]))

            opt.zero_grad()
            sr = twin.forward(
                torch.from_numpy(lr_clip.transpose(0, 1, 4, 2, 3)), oh, ow
            )
            diff = sr - torch.from_numpy(hr_clip.transpose(0, 1, 4, 2, 3))
            loss = torch.sqrt(diff * diff + 1e-12).mean()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))
        sched.step()

    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=1e-6)
    # final trainable weights agree; the SpyNet never moved
    final = _TorchBasicVSRTwin(state.params, nf, nb, scale)
    for got, want in zip(final.tensors(), twin.tensors()):
        np.testing.assert_allclose(
            got.detach().numpy(), want.detach().numpy(), rtol=1e-3, atol=5e-5
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.params["spynet"],
        spy_init,
    )


def test_naive_multi_train_lockstep():
    """12 lockstep steps (4 'epochs' x 3, crossing the [E/2, 8E/10]
    milestones) of 'multi' NaiveMultiModel training — the NAS-product VSR
    type the entry points actually use (naive_multi_model_easy.py:34-154):
    block_index consumption, frozen SpyNet (flownet), temporal concat in
    block 0. Per-step Charbonnier losses and final trainable weights must
    match the torch twin; the frozen flownet must be bitwise-untouched."""
    from helpers.torch_twins import _TorchNaiveMultiTwin

    from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
    from mobilesuperresolution_tpu.models.naive_multi import NaiveMultiModel
    from mobilesuperresolution_tpu.train.state import vsr_multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    idx = ((8, 8, 3), (8, 7, 5))
    t, hw, scale = 3, 64, 4  # hw >= 64: the 6-level SpyNet pyramid halves 5x
    steps_per_epoch, epochs, lr = 3, 4, 1e-3
    oh = ow = hw * scale

    model = NaiveMultiModel(scale=scale, idx=idx)
    sample = jnp.zeros((1, t, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(7), sample)
    mask = spynet_frozen_mask(variables["params"])
    tx = vsr_multistep_adam(lr, steps_per_epoch, epochs, trainable_mask=mask)
    state = create_train_state(
        model, jax.random.key(7), sample, tx, variables=variables
    )
    step = make_vsr_step(state, (oh, ow))
    flow_init = jax.tree.map(np.asarray, state.params["flownet"])

    twin = _TorchNaiveMultiTwin(state.params, idx, scale)
    opt = torch.optim.Adam(twin.tensors(), lr=lr, betas=(0.9, 0.99))
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[epochs // 2, epochs * 8 // 10], gamma=0.3
    )

    rng = np.random.default_rng(11)
    ours, theirs = [], []
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            lr_clip = rng.random((1, t, hw, hw, 3), np.float32)
            hr_clip = rng.random((1, t, oh, ow, 3), np.float32)
            state, metrics = step(
                state, (jnp.asarray(lr_clip), jnp.asarray(hr_clip))
            )
            ours.append(float(metrics["loss"]))

            opt.zero_grad()
            sr = twin.forward(torch.from_numpy(lr_clip.transpose(0, 1, 4, 2, 3)))
            diff = sr - torch.from_numpy(hr_clip.transpose(0, 1, 4, 2, 3))
            loss = torch.sqrt(diff * diff + 1e-12).mean()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))
        sched.step()

    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=1e-6)
    final = _TorchNaiveMultiTwin(state.params, idx, scale)
    for got, want in zip(final.tensors(), twin.tensors()):
        np.testing.assert_allclose(
            got.detach().numpy(), want.detach().numpy(), rtol=1e-3, atol=5e-5
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.params["flownet"],
        flow_init,
    )


def test_mvvsr_train_lockstep():
    """12 lockstep steps (4 'epochs' x 3, crossing both milestones) of
    MotionVectorVSR training (mvvsr_arch.py:11-109): bitstream flows
    (forward = mv[:, 1:], backward = -forward), recurrent trunks, fusion +
    ConvTranspose reconstruction. Per-step Charbonnier losses and final
    weights must match the torch twin. All params train (no SpyNet exists
    in our MV model)."""
    from helpers.torch_twins import _TorchMVVSRTwin

    from mobilesuperresolution_tpu.models.mvvsr import MotionVectorVSR
    from mobilesuperresolution_tpu.train.state import vsr_multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    nf, nb, t, hw, scale = 8, 1, 3, 24, 4
    steps_per_epoch, epochs, lr = 3, 4, 1e-3
    oh = ow = hw * scale

    model = MotionVectorVSR(scale=scale, num_feat=nf, num_block=nb)
    sample = jnp.zeros((1, t, hw, hw, 5), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(13), sample, oh, ow
    )
    tx = vsr_multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(
        model, jax.random.key(13), sample, tx, extra_args=(oh, ow),
        variables=variables,
    )
    step = make_vsr_step(state, (oh, ow))

    twin = _TorchMVVSRTwin(state.params, nf, nb, scale)
    opt = torch.optim.Adam(twin.tensors(), lr=lr, betas=(0.9, 0.99))
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[epochs // 2, epochs * 8 // 10], gamma=0.3
    )

    rng = np.random.default_rng(17)
    ours, theirs = [], []
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            x = rng.random((1, t, hw, hw, 3), np.float32)
            mv = ((rng.random((1, t, hw, hw, 2)) - 0.5) * 4).astype(np.float32)
            lr_clip = np.concatenate([x, mv], axis=-1)
            hr_clip = rng.random((1, t, oh, ow, 3), np.float32)
            state, metrics = step(
                state, (jnp.asarray(lr_clip), jnp.asarray(hr_clip))
            )
            ours.append(float(metrics["loss"]))

            opt.zero_grad()
            sr = twin.forward(
                torch.from_numpy(lr_clip.transpose(0, 1, 4, 2, 3)), oh, ow
            )
            diff = sr - torch.from_numpy(hr_clip.transpose(0, 1, 4, 2, 3))
            loss = torch.sqrt(diff * diff + 1e-12).mean()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))
        sched.step()

    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=1e-6)
    final = _TorchMVVSRTwin(state.params, nf, nb, scale)
    for got, want in zip(final.tensors(), twin.tensors()):
        np.testing.assert_allclose(
            got.detach().numpy(), want.detach().numpy(), rtol=1e-3, atol=5e-5
        )
