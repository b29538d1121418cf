"""Orbax checkpointing with REAL resume.

Artifacts mirror the reference's layout (SURVEY §5.4):
- <job>/weights/        — latest params only (the reference's models.pt)
- <job>/ckpt/           — full state {params, opt_state, epoch} (latest.pth)
The reference's --resume flag never loads anything (pretrain.py:313, SURVEY
§5.3); here ``restore`` actually restores params + optimizer state + epoch.
"""

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, job_dir, max_to_keep=3):
        self.job_dir = job_dir
        path = os.path.abspath(os.path.join(job_dir, "ckpt"))
        os.makedirs(path, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, epoch: int, state, extra: Optional[dict] = None):
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
        }
        if extra:
            payload["extra"] = jax.device_get(extra)
        self._mngr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _has_extra(self, epoch: int) -> bool:
        """Probe the saved item's top-level keys for 'extra' (metadata when
        available, directory layout as fallback) so restore() does not need
        the caller to know how the checkpoint was saved."""
        try:
            meta = self._mngr.item_metadata(epoch)
            tree = getattr(meta, "item_metadata", meta)
            keys = getattr(tree, "keys", None)
            if callable(keys):
                return "extra" in tree
        except Exception:
            pass
        root = self._mngr.directory / str(epoch)
        for item_dir in ("default", "state"):
            d = root / item_dir / "extra"
            if d.exists():
                return True
        return (root / "extra").exists()

    def restore(self, state, epoch: Optional[int] = None, extra_template=None):
        """Returns (state_with_restored_params_and_opt, epoch) or (state, 0)
        if nothing to restore.

        extra_template: pass the same-structured dict that was given to
        ``save(extra=...)`` to get it back via ``self.last_extra``. Whether
        the checkpoint actually contains 'extra' is probed from the stored
        item metadata, so restoring an extra-bearing checkpoint without a
        template (or vice versa) degrades gracefully instead of failing on
        orbax tree-structure mismatch."""
        target_epoch = epoch if epoch is not None else self._mngr.latest_step()
        self.last_extra = None
        if target_epoch is None:
            return state, 0
        has_extra = self._has_extra(target_epoch)
        if has_extra and extra_template is None:
            # orbax StandardRestore has no partial restore — recover the
            # as-saved tree and pick the pieces out.
            restored = self._mngr.restore(target_epoch)
        else:
            template = {
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state),
                "step": 0,
                "epoch": 0,
            }
            if extra_template is not None and has_extra:
                template["extra"] = jax.device_get(extra_template)
            restored = self._mngr.restore(
                target_epoch, args=ocp.args.StandardRestore(template)
            )
        self.last_extra = restored.get("extra")
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, restored["epoch"]


def save_params_npz(job_dir, params, name="models"):
    """Flat-npz export of params (the reference's bare state_dict models.pt)."""
    out_dir = os.path.join(job_dir, "weights")
    os.makedirs(out_dir, exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(out_dir, f"{name}.npz"), **flat)
    return os.path.join(out_dir, f"{name}.npz")


def load_params_npz(path, params_template):
    """Inverse of save_params_npz onto a params pytree template."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = []
    for p, leaf in leaves:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), new_leaves
    )
