"""Train state + optimizers.

The reference uses Adam + MultiStepLR(milestones=[E/2, 9E/10], gamma=0.3)
(pretrain.py:135-143) and, for search phases, Adam over a *subset* of params
with a fresh DDP wrap per phase (search.py:290-405). Here phase switching is an
optax ``multi_transform`` mask — no re-wrapping (SURVEY §7.3).
"""

from typing import Any, Callable, Optional

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    step: int
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def multistep_lr(base_lr, steps_per_epoch, epochs, gamma=0.3, milestones=None):
    """MultiStepLR as an optax schedule. Default milestones = [E/2, 9E/10]
    epochs (pretrain.py:139-142)."""
    if milestones is None:
        milestones = [epochs // 2, epochs * 9 // 10]
    # torch MultiStepLR applies gamma once PER OCCURRENCE of a milestone —
    # duplicate milestones (e.g. [1, 1] from epochs=2 defaults) must compound
    # to gamma^2, not collapse into one dict key. Milestone 0 (epochs=1
    # defaults) applies from the very first step in torch
    # (bisect_right([0], 0) == 1), so it folds into the initial value.
    boundaries = {}
    init = base_lr
    for m in milestones:
        if m > 0:
            step = int(m * steps_per_epoch)
            boundaries[step] = boundaries.get(step, 1.0) * gamma
        else:
            init = init * gamma
    return optax.piecewise_constant_schedule(init, boundaries)


def multistep_adam(
    base_lr,
    steps_per_epoch,
    epochs,
    gamma=0.3,
    milestones=None,
    trainable_mask: Optional[Any] = None,
    betas=(0.9, 0.999),
):
    """Adam with the reference's LR schedule; ``trainable_mask`` is a pytree of
    bools (True = train) implementing the search phases' parameter freezing.

    ``betas`` defaults to torch's Adam defaults — what the reference's
    pretrain/search use (pretrain.py:137, search.py:173). The VSR trainer
    overrides b2=0.99 and milestones=[E/2, 8E/10]
    (train_video_superresolution.py:163-168) — see ``vsr_multistep_adam``."""
    sched = multistep_lr(base_lr, steps_per_epoch, epochs, gamma, milestones)
    tx = optax.adam(learning_rate=sched, b1=betas[0], b2=betas[1])
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask
            ),
        )
    return tx


def vsr_multistep_adam(
    base_lr, steps_per_epoch, epochs, trainable_mask: Optional[Any] = None
):
    """The VSR trainer's exact optimizer: Adam betas (0.9, 0.99) and
    MultiStepLR milestones [E/2, 8E/10] — both DIFFER from the pretrain/search
    conventions (train_video_superresolution.py:163-168 vs pretrain.py:137-142).
    Verified in lockstep vs the torch twin
    (tests/test_training_parity.py::test_vsr_train_lockstep)."""
    return multistep_adam(
        base_lr,
        steps_per_epoch,
        epochs,
        milestones=[epochs // 2, epochs * 8 // 10],
        trainable_mask=trainable_mask,
        betas=(0.9, 0.99),
    )


def create_train_state(model, rng, sample_input, tx, extra_args=(), variables=None):
    # jit the init: eager init dispatches each op separately, which is
    # pathologically slow through a remote-compile tunnel (observed ~40 min
    # for a 240p recurrent model vs seconds jitted). Callers that already
    # ran init (e.g. to derive an optimizer mask from the param tree) pass
    # ``variables`` so the expensive init doesn't run twice.
    if variables is None:
        static = tuple(range(2, 2 + len(extra_args)))
        init_fn = jax.jit(model.init, static_argnums=static)
        variables = init_fn(rng, sample_input, *extra_args)
    return TrainState(
        step=0,
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
