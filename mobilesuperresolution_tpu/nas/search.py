"""Three-phase NAS search driver pieces (reference: search.py:184-458).

Phases (each with its own optimizer; the reference re-wraps DDP per phase
because DDP caches trainable params — here a phase is just a fresh optax
``multi_transform`` mask over the same state, SURVEY §7.3):

1. width  (width_epochs, lr×10): alpha1/alpha2 (block skip) frozen —
   everything else trains.
2. length (epochs): everything trains.
3. kernel (kernel_epochs): alpha1/alpha2 AND the channel gates
   (mask_w, split_w) frozen — conv weights + kernel-mix alpha train.

The latency target anneals via SpeedScheduler over phases 1+2 (gamma=0.5,
search.py:271-274); SpeedLoss scale = ori_speed − target (search.py:266).
"""

import flax.traverse_util as traverse_util


PHASES = ("width", "length", "kernel")


def phase_trainable_mask(params, phase):
    """Pytree of bools: True = trainable in this phase."""
    assert phase in PHASES, phase
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for key in flat:
        leaf = key[-1]
        is_length = leaf in ("alpha1", "alpha2")
        is_gate = leaf in ("mask_w", "split_w")
        if phase == "width":
            mask[key] = not is_length
        elif phase == "length":
            mask[key] = True
        else:  # kernel
            mask[key] = not (is_length or is_gate)
    return traverse_util.unflatten_dict(mask)


def phase_lr(base_lr, phase):
    """Phase 1 uses lr×10 (search.py:299 — the /world_size cancels the
    earlier ×world_size scaling in the data-parallel setup)."""
    return base_lr * 10.0 if phase == "width" else base_lr


def phase_epochs(params, phase):
    return {
        "width": params.width_epochs if params.width_search else 0,
        "length": params.epochs,
        "kernel": params.kernel_epochs,
    }[phase]
