"""Checkpointing: orbax save/restore, forgiving partial restore,
best-by-metric retention, auto-resume.

Reference behaviors reproduced (SURVEY §5.4):
- ckpt payload = {step, epoch, params, batch_stats, opt_state, mean_iu,
  command} (reference save_dict: utils/misc.py:147-155);
- best-by-mIoU retention (logx.save_model);
- ``forgiving_state_restore``: skip shape-mismatched entries to allow
  cross-dataset transfer, e.g. 65-class Mapillary -> 19-class Cityscapes
  (reference: loss/optimizer.py:137-154);
- weights-only "snapshot" warm start vs full resume
  (reference: train.py:343-376).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def forgiving_merge(target: dict, loaded: dict, log=print) -> dict:
    """Merge ``loaded`` into ``target`` params/stats trees, skipping keys
    missing or shape-mismatched (reference forgiving_state_restore:
    loss/optimizer.py:137-154)."""
    flat_t = flatten_tree(target)
    flat_l = flatten_tree(loaded)
    merged = {}
    skipped = []
    for k, v in flat_t.items():
        if k in flat_l and tuple(np.shape(flat_l[k])) == tuple(np.shape(v)):
            merged[k] = flat_l[k]
        else:
            merged[k] = v
            skipped.append(k)
    for k in skipped:
        log(f"Skipped loading parameter {k}")
    # unflatten
    out: dict = {}
    for k, v in merged.items():
        parts = k.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


class CheckpointManager:
    """Thin orbax wrapper with best-by-metric retention."""

    def __init__(self, directory: str, keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=lambda m: m.get("mean_iu", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state, epoch: int, mean_iu: float,
             extra: Optional[dict] = None):
        """Save a checkpoint. ``extra`` may add NUMERIC scalar metadata
        (orbax StandardSave rejects strings); restore() rebuilds its meta
        template from the saved structure, so extra keys round-trip."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "meta": {"epoch": epoch, "step": int(state.step),
                     "mean_iu": float(mean_iu), **(extra or {})},
        }
        self.manager.save(step, args=ocp.args.StandardSave(payload),
                          metrics={"mean_iu": float(mean_iu)})
        # NO wait_until_finished here: orbax copies device arrays to host
        # synchronously inside save() (so later donation of the state
        # buffers is safe) and writes asynchronously — blocking here would
        # stall the train loop for the full write. Callers must
        # wait_until_finished() before process exit (Trainer.fit does).

    def wait_until_finished(self):
        """Block until pending async writes land (call before exit)."""
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None,
                target_state=None) -> Optional[dict]:
        """Restore a checkpoint payload.

        ``target_state`` (a live TrainState) supplies the pytree structure:
        without it, orbax's StandardRestore returns the opt_state as plain
        lists/dicts (losing the optax namedtuples), and the first
        ``tx.update`` after resume crashes. With it, every container type
        (ScaleByAdamState etc.) is reconstructed faithfully.
        """
        self.manager.wait_until_finished()  # in-flight async save, if any
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if target_state is None:
            return self.manager.restore(step)

        def abstract(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype)
            return x

        # build the meta template from the checkpoint's own structure so
        # payloads saved with extra numeric keys (save(..., extra=...))
        # stay restorable — a fixed key set here would make orbax reject
        # them with a tree-structure mismatch
        meta_template: dict = {"epoch": 0, "step": 0, "mean_iu": 0.0}
        try:
            saved_meta = self.manager.item_metadata(step).tree["meta"]
            meta_template = {
                k: (0 if "int" in str(v.dtype) else 0.0)
                for k, v in saved_meta.items()}
        except Exception:
            pass  # older orbax / layouts: fall back to the default keys

        payload = {
            "params": target_state.params,
            "batch_stats": target_state.batch_stats,
            "opt_state": target_state.opt_state,
            "meta": meta_template,
        }
        abstract_payload = jax.tree.map(abstract, payload)
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract_payload))


def load_snapshot(path: str, target_params: dict, target_stats: dict,
                  log=print):
    """Weights-only warm start with forgiving merge
    (reference --snapshot path: train.py:367-376)."""
    ckptr = ocp.StandardCheckpointer()
    loaded = ckptr.restore(os.path.abspath(path))
    params = forgiving_merge(target_params, loaded.get("params", loaded), log)
    stats = target_stats
    if "batch_stats" in loaded:
        stats = forgiving_merge(target_stats, loaded["batch_stats"], log)
    return params, stats


class AutoResume:
    """File-based preemption/resume handshake (reference: the cluster
    AutoResume hook, train.py:303-321, 343-358): if a termination-request
    file appears, training checkpoints and exits; on restart the latest
    checkpoint in the manager resumes automatically."""

    def __init__(self, signal_file: Optional[str] = None):
        self.signal_file = signal_file

    def termination_requested(self) -> bool:
        return bool(self.signal_file) and os.path.exists(self.signal_file)
