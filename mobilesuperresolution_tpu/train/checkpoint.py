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
        self._meta_path = os.path.join(path, "run_meta.json")
        self._meta_written = False
        self._mngr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def _write_run_meta(self):
        """Chief-written sidecar pinning run topology. The per-host batch
        partitioning (data/isr.py::_batches) and the linear LR scaling
        (pretrain.py:216-217 semantics) are functions of process_count, so a
        resume under a different count would silently train with a different
        global batch and schedule — restore() refuses instead.

        The first save of each manager instance OVERWRITES the sidecar: a
        fresh (non-resume) run re-using an old job dir must not inherit a
        stale count (a resume run has already passed _check_run_meta by the
        time it saves, so overwriting with its own count is a no-op)."""
        import json

        if jax.process_index() != 0 or self._meta_written:
            return
        tmp = f"{self._meta_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"process_count": jax.process_count()}, f)
        os.replace(tmp, self._meta_path)
        self._meta_written = True

    def _check_run_meta(self):
        import json

        if not os.path.exists(self._meta_path):
            return
        try:
            with open(self._meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return
        saved = meta.get("process_count")
        if saved is not None and saved != jax.process_count():
            raise ValueError(
                f"checkpoint was written by a {saved}-process job but this "
                f"run has {jax.process_count()} processes: the per-host "
                "batch partition and the linearly-scaled LR depend on the "
                "process count, so resuming would silently change the "
                "global batch and schedule. Relaunch with the original "
                f"process count, or delete {self._meta_path} to accept the "
                "changed training trajectory."
            )

    def save(self, epoch: int, state, extra: Optional[dict] = None, force=False):
        """``force=True`` overwrites an existing save at this epoch id — the
        end-of-epoch save after resuming from a mid-epoch preemption
        checkpoint of the SAME epoch (train/preemption.py) upgrades it in
        place."""
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
        }
        if extra:
            payload["extra"] = jax.device_get(extra)
        self._write_run_meta()
        if force and epoch in self._mngr.all_steps():
            self._mngr.delete(epoch)
        self._mngr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _has_extra(self, epoch: int) -> bool:
        """Probe the saved item's top-level keys for 'extra' so restore()
        does not need the caller to know how the checkpoint was saved.
        The in-memory metadata probe only works on the manager instance that
        did the save (a FRESH manager — the resume case — returns None), so
        fall back to the checkpoint's on-disk ``_METADATA`` tree, where every
        leaf's key path is recorded."""
        try:
            meta = self._mngr.item_metadata(epoch)
            tree = getattr(meta, "item_metadata", meta)
            keys = getattr(tree, "keys", None)
            if callable(keys):
                return "extra" in tree
        except Exception:
            pass
        import json

        root = self._mngr.directory / str(epoch)
        for item_dir in ("default", "state", "."):
            f = root / item_dir / "_METADATA"
            if not f.exists():
                continue
            try:
                tm = json.loads(f.read_text()).get("tree_metadata", {})
            except (OSError, ValueError):
                continue
            for leaf in tm.values():
                km = leaf.get("key_metadata") or []
                if km and km[0].get("key") == "extra":
                    return True
            return False
        return False

    def _extra_template_from_disk(self, epoch: int):
        """Zero-valued template of the 'extra' item reconstructed from the
        checkpoint's on-disk ``_METADATA`` key paths (scalar leaves only —
        which is all the framework stores there). Lets restore() stay fully
        typed (StandardRestore) without the caller knowing whether/what
        'extra' was saved."""
        import json

        root = self._mngr.directory / str(epoch)
        for item_dir in ("default", "state", "."):
            f = root / item_dir / "_METADATA"
            if not f.exists():
                continue
            try:
                tm = json.loads(f.read_text()).get("tree_metadata", {})
            except (OSError, ValueError):
                return None
            out = {}
            for leaf in tm.values():
                km = leaf.get("key_metadata") or []
                keys = [k.get("key") for k in km]
                if not keys or keys[0] != "extra":
                    continue
                d = out
                for k in keys[1:-1]:
                    d = d.setdefault(k, {})
                d[keys[-1]] = 0
            return out or None
        return None

    def peek_extra(self, epoch: Optional[int]):
        """The ``extra`` dict of a saved step, or None — without a state
        template. Used by resume logic (cli/search.py) that must know the
        mid-epoch position before the phase-local state exists. Full item
        read; call once."""
        if epoch is None or not self._has_extra(epoch):
            return None
        return self._mngr.restore(epoch).get("extra")

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
        self._check_run_meta()
        has_extra = self._has_extra(target_epoch)
        if has_extra and extra_template is None:
            extra_template = self._extra_template_from_disk(target_epoch)
        if has_extra and extra_template is None:
            # orbax StandardRestore has no partial restore — recover the
            # as-saved tree and pick the pieces out. Untyped: opt_state comes
            # back as plain dicts, so only reachable if the on-disk metadata
            # probe failed (never for checkpoints this framework wrote).
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
    """Flat-npz export of params (the reference's bare state_dict models.pt).
    Written atomically (tmp + rename): mid-epoch saves make this a crash
    window, and the search resume path reads this artifact."""
    out_dir = os.path.join(job_dir, "weights")
    os.makedirs(out_dir, exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    final = os.path.join(out_dir, f"{name}.npz")
    tmp = final + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, final)
    return final


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
