"""Training smoke tests: loss falls, resume restores, search step runs,
multi-chip dry run works on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.data.synthetic import SyntheticISRDataset
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.models import BasicModel, NASModel
from mobilesuperresolution_tpu.nas import SpeedLoss, get_ori_speed
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam
from mobilesuperresolution_tpu.train.steps import make_search_step, make_sisr_step
from mobilesuperresolution_tpu.train.checkpoint import CheckpointManager


class P:
    scale = 2
    lr_patch_size = 16
    ignored_boundary_size = 2
    num_patches = 4
    seed = 0


def _batches(n=6, bs=4):
    ds = SyntheticISRDataset(modes.TRAIN, P(), num_images=4, hw=(96, 96))
    out = []
    it = batch_iterator(ds, bs, shuffle=True, seed=0)
    for i, b in enumerate(it):
        if i >= n:
            break
        out.append(b)
    return out


def test_sisr_training_loss_falls():
    model = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, steps_per_epoch=6, epochs=10)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), tx)
    step = make_sisr_step(state)
    batches = _batches(n=12)
    losses = []
    for b in batches:
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_search_step_and_speed_loss():
    model = NASModel(num_blocks=2, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, steps_per_epoch=4, epochs=4)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), tx)
    sl = SpeedLoss(scale=get_ori_speed(2, 8))
    step = make_search_step(state, sl)
    for b in _batches(n=3):
        state, m = step(state, b, speed_target=5.0)
    assert np.isfinite(float(m["loss"]))
    assert float(m["speed"]) > 0


def test_checkpoint_save_restore(tmp_path):
    model = BasicModel(num_blocks=1, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, steps_per_epoch=2, epochs=2)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)), tx)
    step = make_sisr_step(state)
    for b in _batches(n=2):
        state, _ = step(state, b)
    mngr = CheckpointManager(str(tmp_path))
    mngr.save(epoch=3, state=state)

    fresh = create_train_state(model, jax.random.key(1), jnp.zeros((1, 8, 8, 3)), tx)
    restored, epoch = mngr.restore(fresh)
    assert epoch == 3
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(restored.params)
    b_ = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b_):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_trainable_mask_freezes_params():
    model = NASModel(num_blocks=2, num_residual_units=8, scale=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    params = variables["params"]
    # phase-1 style: train everything except alpha1/alpha2 (length frozen)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    mask = {k: not (k[-1] in ("alpha1", "alpha2")) for k in flat}
    mask_tree = tu.unflatten_dict(mask)
    tx = multistep_adam(1e-2, 10, 10, trainable_mask=mask_tree)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)), tx)
    a1_before = float(state.params["block_0"]["alpha1"])
    step = make_search_step(state, SpeedLoss(10.0))
    for b in _batches(n=2):
        state, _ = step(state, b, 1.0)
    assert float(state.params["block_0"]["alpha1"]) == a1_before
    # something else did move
    assert float(jnp.abs(state.params["mask_w"] - variables["params"]["mask_w"]).sum()) > 0


def test_dryrun_multichip_8_devices(eight_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_vsr_training_step_and_spynet_freeze():
    import flax.traverse_util as tu

    from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
    from mobilesuperresolution_tpu.models import get_vsr_model
    from mobilesuperresolution_tpu.train.steps import make_vsr_step

    model = get_vsr_model("basic", scale=4)
    t, ps = 2, 8
    sample = jnp.zeros((1, t, ps, ps, 3))
    out_hw = (ps * 4, ps * 4)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), sample, *out_hw
    )
    mask = spynet_frozen_mask(variables["params"])
    flat = tu.flatten_dict(mask)
    assert any(not v for v in flat.values())  # spynet leaves frozen
    assert any(v for v in flat.values())

    tx = multistep_adam(1e-3, 2, 2, trainable_mask=mask)
    state = create_train_state(
        model, jax.random.key(0), sample, tx, extra_args=out_hw
    )
    spy_before = jax.tree_util.tree_leaves(state.params["spynet"])[0].copy()
    step = make_vsr_step(state, out_hw)
    rngs = np.random.default_rng(0)
    hr = rngs.random((2, t, ps * 4, ps * 4, 3)).astype(np.float32)
    lr = hr[:, :, ::4, ::4]
    state, metrics = step(state, (lr, hr))
    assert np.isfinite(float(metrics["loss"]))
    spy_after = jax.tree_util.tree_leaves(state.params["spynet"])[0]
    np.testing.assert_array_equal(np.asarray(spy_before), np.asarray(spy_after))


def test_patch_eval_tv_statistics():
    from mobilesuperresolution_tpu.cli.test_vsr_by_patch import (
        evaluate_by_patch,
        time_variation,
        total_variation,
    )
    from mobilesuperresolution_tpu.ops.resize import resize_bilinear

    rngs = np.random.default_rng(0)
    clip = jnp.asarray(rngs.random((1, 3, 16, 16, 3)).astype(np.float32))
    tv = total_variation(clip)
    assert tv.shape == (3,)
    tt = time_variation(clip)
    assert tt.shape == (3,)
    # static clip → zero temporal variation
    static = jnp.ones((1, 3, 8, 8, 3))
    assert float(jnp.abs(time_variation(static)).max()) == 0.0

    hr = jnp.asarray(rngs.random((1, 2, 32, 32, 3)).astype(np.float32))
    lr = hr[:, :, ::2, ::2]
    result = evaluate_by_patch(
        lambda x, oh, ow: resize_bilinear(x, (oh, ow), align_corners=False),
        [("clip", lr, hr)],
        scale=2,
        patch=(8, 8),
        overlap=(2, 0),
    )
    assert result.shape[0] == 4 and result.shape[1] > 0
    assert np.isfinite(result).all()


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 3, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_eval_data_parallel_matches_single(eight_devices):
    """Mesh-sharded patch eval == unsharded patch eval (same patches, same
    statistics), patch batch padded to the data-axis size."""
    from mobilesuperresolution_tpu.cli.test_vsr_by_patch import evaluate_by_patch
    from mobilesuperresolution_tpu.ops.resize import resize_bilinear
    from mobilesuperresolution_tpu.parallel import make_mesh

    rngs = np.random.default_rng(0)
    hr = jnp.asarray(rngs.random((1, 2, 32, 48, 3)).astype(np.float32))
    lr = hr[:, :, ::2, ::2]
    fwd = lambda x, oh, ow: resize_bilinear(x, (oh, ow), align_corners=False)
    ref = evaluate_by_patch(
        fwd, [("clip", lr, hr)], scale=2, patch=(8, 8), overlap=(2, 0)
    )
    mesh = make_mesh(data=8, spatial=1)
    with mesh:
        got = evaluate_by_patch(
            fwd,
            [("clip", lr, hr)],
            scale=2,
            patch=(8, 8),
            overlap=(2, 0),
            mesh=mesh,
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_spatially_sharded_inference_matches_full(eight_devices):
    """The exported inference API (parallel/halo.py::spatially_sharded_apply)
    over a spatial=8 mesh must be numerically identical to the full-frame
    forward, and reject non-shardable inputs with a real error."""
    from mobilesuperresolution_tpu.parallel import make_mesh, spatially_sharded_apply
    from mobilesuperresolution_tpu.parallel.halo import receptive_radius_wdsr

    model = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    radius = receptive_radius_wdsr(2)
    rngs = np.random.default_rng(1)
    x = jnp.asarray(rngs.random((2, 80, 16, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    fn = lambda img: model.apply({"params": params}, img)
    mesh = make_mesh(data=1, spatial=8)
    got = spatially_sharded_apply(fn, x, mesh, radius=radius, scale=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(x)), atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        spatially_sharded_apply(fn, x[:, :79], mesh, radius=radius, scale=2)


def test_spatial_sharded_training_matches_plain(eight_devices):
    """Spatially-sharded SISR training (parallel/spatial_train.py) over a
    (data=2, spatial=4) mesh: loss and post-step params must match the plain
    single-device step — gradients are exact by construction (each output
    row computed once, window-forward ≡ full-frame forward)."""
    from mobilesuperresolution_tpu.parallel import make_mesh, make_spatial_sisr_step
    from mobilesuperresolution_tpu.parallel.halo import receptive_radius_wdsr

    model = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    radius = receptive_radius_wdsr(2)
    tx = multistep_adam(1e-3, steps_per_epoch=4, epochs=2)
    rngs = np.random.default_rng(0)
    hr = jnp.asarray(rngs.random((2, 80, 24, 3)).astype(np.float32))
    lr = hr[:, ::2, ::2]

    s0 = create_train_state(model, jax.random.key(0), jnp.zeros((1, 40, 12, 3)), tx)
    plain = make_sisr_step(s0)
    s_plain, m_plain = plain(s0, (lr, hr))

    s1 = create_train_state(model, jax.random.key(0), jnp.zeros((1, 40, 12, 3)), tx)
    mesh = make_mesh(data=2, spatial=4)
    spatial = make_spatial_sisr_step(s1, mesh, radius=radius, scale=2)
    s_shard, m_shard = spatial(s1, (lr, hr))

    assert float(m_shard["loss"]) == pytest.approx(float(m_plain["loss"]), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_plain.params),
        jax.tree_util.tree_leaves(s_shard.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_nan_guard_skips_update():
    """A batch with a non-finite loss must not move params, optimizer
    moments, or the LR schedule (failure guard — SURVEY §5.3: the reference
    trains unguarded); the next clean batch trains normally."""
    from mobilesuperresolution_tpu.models import BasicModel
    from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_sisr_step

    model = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, steps_per_epoch=4, epochs=2)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)), tx
    )
    step = make_sisr_step(state)
    rngs = np.random.default_rng(0)
    hr = rngs.random((2, 16, 16, 3)).astype(np.float32)
    lr = hr[:, ::2, ::2]

    bad_hr = hr.copy()
    bad_hr[0, 0, 0, 0] = np.nan
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    o0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.opt_state)]
    state1, m1 = step(state, (lr, bad_hr))
    assert float(m1["skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state1.params)[0]), np.asarray(p0)
    )
    for a, b in zip(o0, jax.tree_util.tree_leaves(state1.opt_state)):
        np.testing.assert_array_equal(a, np.asarray(b))

    state2, m2 = step(state1, (lr, hr))
    assert float(m2["skipped"]) == 0.0
    assert np.isfinite(float(m2["loss"]))
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]), np.asarray(p0)
    )


def test_multistep_lr_torch_parity_degenerate_milestones():
    """torch MultiStepLR semantics: lr(e) = base * gamma^bisect_right(
    milestones, e). Duplicates compound; milestone 0 (epochs=1 defaults
    [0, 0]) applies gamma^2 from the very first step."""
    from mobilesuperresolution_tpu.train.state import multistep_lr

    base, gamma, spe = 1e-3, 0.3, 10
    # epochs=1 -> default milestones [0, 0]: gamma^2 from step 0
    sched = multistep_lr(base, spe, epochs=1)
    np.testing.assert_allclose(float(sched(0)), base * gamma**2, rtol=1e-6)
    # epochs=2 -> [1, 1]: base until step 10, gamma^2 after
    sched = multistep_lr(base, spe, epochs=2)
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), base * gamma**2, rtol=1e-6)
    # normal case [15, 27] of epochs=30
    sched = multistep_lr(base, spe, epochs=30)
    np.testing.assert_allclose(float(sched(200)), base * gamma, rtol=1e-6)
    np.testing.assert_allclose(float(sched(280)), base * gamma**2, rtol=1e-6)


def test_nas_speed_table_bounds_rejected():
    """An undersized measured table must be rejected at trace time — the
    in-jit lookup would silently clamp channel indices and score wide
    blocks with the table-edge latency."""
    import pytest

    from mobilesuperresolution_tpu.models.wdsr_nas import NASModel

    model = NASModel(num_blocks=1, num_residual_units=16, scale=2)
    x = jnp.zeros((1, 8, 8, 3))
    small_table = jnp.ones((3, 9, 9), jnp.float32)  # covers only ch<=8
    with pytest.raises(ValueError, match="re-densify"):
        model.init(jax.random.key(0), x, small_table)


def test_restore_rejects_process_count_change(tmp_path):
    """Resuming under a different process count silently changes the global
    batch and the linearly-scaled LR — restore() refuses via the run_meta
    sidecar (train/checkpoint.py::_check_run_meta)."""
    import json

    model = BasicModel(num_blocks=1, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, steps_per_epoch=2, epochs=2)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)), tx)
    mngr = CheckpointManager(str(tmp_path))
    mngr.save(epoch=1, state=state)

    meta = tmp_path / "ckpt" / "run_meta.json"
    assert json.loads(meta.read_text()) == {"process_count": 1}

    meta.write_text(json.dumps({"process_count": 4}))
    with pytest.raises(ValueError, match="4-process job"):
        CheckpointManager(str(tmp_path)).restore(state)

    # a FRESH run (no restore) re-using the job dir refreshes the sidecar
    CheckpointManager(str(tmp_path)).save(epoch=2, state=state)
    assert json.loads(meta.read_text()) == {"process_count": 1}

    # deleting the sidecar is the documented override
    meta.write_text(json.dumps({"process_count": 4}))
    meta.unlink()
    _, epoch = CheckpointManager(str(tmp_path)).restore(state)
    assert epoch == 2
