"""jit-compiled train steps (data-parallel over the mesh's 'data' axis).

One pjit-compiled function per workload; the gradient all-reduce is implicit
in the sharding (batch sharded over 'data', params replicated — XLA inserts
the psum over ICI). This replaces the reference's DDP/NCCL machinery
(pretrain.py:239, search.py:329-337).
"""

import functools

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.train.losses import charbonnier_loss, l1_loss


def _guarded_update(params, opt_state, grads, loss, tx):
    """Failure-detection guard (SURVEY §5.3 — the reference trains unguarded):
    a batch producing a non-finite loss or gradient SKIPS the optimizer update
    — params, optimizer moments, and the LR schedule all stay put — instead
    of poisoning the run. Branch-free under jit; the skip is surfaced in the
    step metrics as ``skipped``."""
    finite = jnp.isfinite(loss)
    finite = functools.reduce(
        lambda a, g: a & jnp.all(jnp.isfinite(g)),
        jax.tree_util.tree_leaves(grads),
        finite,
    )
    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    new_updates, new_opt = tx.update(safe_grads, opt_state, params)
    params = jax.tree_util.tree_map(
        lambda a, u: a + jnp.where(finite, u, jnp.zeros_like(u)).astype(a.dtype),
        params,
        new_updates,
    )
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_opt, opt_state
    )
    skipped = (1.0 - finite.astype(jnp.float32))
    return params, opt_state, skipped


def sisr_step_body(state_tuple, batch, apply_fn, tx, forward=None):
    """The un-jitted SISR step body — one (params, opt_state, step) update.
    Exposed so in-program benchmarks (scripts/bench_train_attribution.py) can
    iterate the EXACT production step inside one compiled fori_loop."""
    params, opt_state, step = state_tuple
    lr_img, hr_img = batch

    def loss_fn(p):
        apply_closure = lambda xx: apply_fn({"params": p}, xx)
        sr = apply_closure(lr_img) if forward is None else forward(apply_closure, lr_img)
        return l1_loss(sr, hr_img)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, opt_state, skipped = _guarded_update(params, opt_state, grads, loss, tx)
    return (params, opt_state, step + 1), {"loss": loss, "l1": loss, "skipped": skipped}


def make_sisr_step(state, forward=None):
    """Returns step(state, batch) -> (state, metrics) for BASIC_MODEL
    pretraining (L1 loss, pretrain.py:61-82).

    forward: optional ``(apply_closure, lr_img) -> sr`` override of the plain
    ``apply_closure(lr_img)`` forward, where ``apply_closure`` already binds
    the current params — used by parallel/spatial_train.py to shard the
    forward spatially without duplicating the step."""

    @functools.partial(jax.jit, static_argnames=("apply_fn", "tx"), donate_argnums=(0,))
    def _step(state_tuple, batch, apply_fn, tx):
        return sisr_step_body(state_tuple, batch, apply_fn, tx, forward=forward)

    def step(state, batch):
        tup, metrics = _step(
            (state.params, state.opt_state, state.step), batch, state.apply_fn, state.tx
        )
        params, opt_state, s = tup
        return state.replace(params=params, opt_state=opt_state, step=s), metrics

    # the un-jitted body, for in-program benchmark loops
    step.body = functools.partial(sisr_step_body, forward=forward)
    return step


def make_search_step(state, speed_loss, weight_sr_l1=1.0, weight_speed=0.1, speed_table=None):
    """NAS search step: L1 + SpeedLoss on the traced latency
    (search.py:71-81). ``speed_target`` is a per-epoch scalar from the
    SpeedScheduler, passed per call. ``speed_table`` optionally switches the
    latency model to on-TPU measurements (closed over; replicated constant)."""

    def _body(state_tuple, batch, speed_target, apply_fn, tx):
        params, opt_state, step = state_tuple
        lr_img, hr_img = batch

        def loss_fn(p):
            sr, speed_accu = apply_fn({"params": p}, lr_img, speed_table)
            l1 = l1_loss(sr, hr_img)
            sp = speed_loss(speed_accu, speed_target, gamma=weight_speed)
            return weight_sr_l1 * l1 + sp, (l1, sp, speed_accu)

        (loss, (l1, sp, speed)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        params, opt_state, skipped = _guarded_update(
            params, opt_state, grads, loss, tx
        )
        return (params, opt_state, step + 1), {
            "loss": loss,
            "l1": l1,
            "speed_loss": sp,
            "speed": speed,
            "skipped": skipped,
        }

    _step = functools.partial(
        jax.jit, static_argnames=("apply_fn", "tx"), donate_argnums=(0,)
    )(_body)

    def step(state, batch, speed_target):
        tup, metrics = _step(
            (state.params, state.opt_state, state.step),
            batch,
            jnp.asarray(speed_target, jnp.float32),
            state.apply_fn,
            state.tx,
        )
        params, opt_state, s = tup
        return state.replace(params=params, opt_state=opt_state, step=s), metrics

    # the un-jitted body, for in-program benchmark loops
    step.body = _body
    return step


def make_vsr_step(state, out_hw, forward=None):
    """VSR train step: Charbonnier L1; model signature (lr, H, W)
    (train_video_superresolution.py:76-97).

    forward: optional ``(params, lr_clip) -> sr`` override of the plain
    ``apply_fn({'params': p}, lr_clip, oh, ow)`` forward — used by
    parallel/vsr_spatial.make_spatial_vsr_step to shard the recurrent
    forward spatially without duplicating the step."""
    oh, ow = out_hw

    def _body(state_tuple, batch, apply_fn, tx):
        params, opt_state, step = state_tuple
        lr_clip, hr_clip = batch

        def loss_fn(p):
            if forward is not None:
                sr = forward(p, lr_clip)
            else:
                sr = apply_fn({"params": p}, lr_clip, oh, ow)
            return charbonnier_loss(sr, hr_clip)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state, skipped = _guarded_update(
            params, opt_state, grads, loss, tx
        )
        return (params, opt_state, step + 1), {"loss": loss, "skipped": skipped}

    _step = functools.partial(
        jax.jit, static_argnames=("apply_fn", "tx"), donate_argnums=(0,)
    )(_body)

    def step(state, batch):
        tup, metrics = _step(
            (state.params, state.opt_state, state.step), batch, state.apply_fn, state.tx
        )
        params, opt_state, s = tup
        return state.replace(params=params, opt_state=opt_state, step=s), metrics

    # the un-jitted body, for in-program benchmark loops
    step.body = _body
    return step
