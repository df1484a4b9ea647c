"""Checkpoint manager: orbax-backed, reference directory-layout parity.

The reference writes ``checkpoint-{iter}`` directories with separate encoder/
decoder state dicts + training args (train.py:151-163) or HF save_pretrained
trees (pretrain.py:257-270); eval enumerates them by iteration
(train.py:182-189).  We keep the ``checkpoint-{iter}`` naming with orbax
StandardCheckpointer payloads (params + optimizer state + step + config),
which adds what the reference lacked: exact training-state resume.

Async saves (``async_save=True`` / ``--async_checkpoints``): orbax's
StandardCheckpointer is an AsyncCheckpointer — ``save`` returns once the
device->host copy is done and commits the payload from a background thread
(and internally blocks on any PREVIOUS in-flight save, and coordinates
multihost actions itself).  In async mode we skip the explicit wait so the
train loop overlaps checkpoint I/O with subsequent steps, and defer the
``meta.json`` commit marker until the write is durable.  ``meta.json`` is
the completeness marker either way: ``steps()`` only lists checkpoints
that have one, so a crash mid-write can never expose a half-written
checkpoint to ``--resume`` (orbax's own tmp-dir rename makes the payload
atomic; the marker makes the *directory* atomic from the manager's view).
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, async_save: bool = False):
        self.output_dir = os.path.abspath(output_dir)
        self.async_save = async_save
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._pending_meta: tuple[str, dict] | None = None

    def path(self, step: int) -> str:
        return os.path.join(self.output_dir, f"checkpoint-{step}")

    def _flush(self) -> None:
        """Block until the in-flight save (if any) is durable, then commit
        its meta.json marker."""
        self._ckpt.wait_until_finished()
        if self._pending_meta is not None:
            path, meta = self._pending_meta
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f, default=str)
            self._pending_meta = None

    def wait_until_finished(self) -> None:
        """Public flush: call after the train loop (and before process exit)
        when running with ``async_save``."""
        self._flush()

    def save(self, step: int, params, opt_state=None, extra: dict | None = None,
             wait: bool | None = None) -> str:
        """Each component is a separate orbax payload so callers can restore
        parameters without the optimizer state (eval paths).

        ``wait=None`` uses the manager default (sync unless ``async_save``);
        pass ``wait=True`` for saves the caller exits right after (the
        preemption checkpoint, the final save).
        """
        wait = (not self.async_save) if wait is None else wait
        self._flush()  # commit the previous async save's marker first
        path = self.path(step)
        self._ckpt.save(os.path.join(path, "params"), params, force=True)
        if opt_state is not None:
            self._ckpt.save(os.path.join(path, "opt_state"), opt_state, force=True)
        meta = {"step": step}
        meta.update(extra or {})
        self._pending_meta = (path, meta)
        if wait:
            self._flush()
        return path

    def restore(self, step: int, template) -> dict:
        """Restore components named by ``template`` keys ("params",
        "opt_state") into their structures.

        Leaves restore host-side (numpy) and the caller re-places them —
        except cross-process sharded leaves (ZeRO-1 moments under
        jax.distributed), which cannot round-trip through numpy: those
        restore directly to their sharding via an abstract-array target."""

        def target_leaf(x):
            if (isinstance(x, jax.Array) and not x.is_fully_addressable
                    and not x.sharding.is_fully_replicated):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return np.asarray(x)

        out = {}
        for name, tmpl in template.items():
            target = jax.tree.map(target_leaf, tmpl)
            out[name] = self._ckpt.restore(
                os.path.join(self.path(step), name), target)
        return out

    def restore_raw(self, step: int, name: str = "params"):
        """Restore a payload without a template (as saved, numpy-backed).
        Used to graft checkpoints across model variants — e.g. a fine-tuned
        nav checkpoint into the classifier agent, whose decoder adds a
        question head (train_classifier.py:129, classifier/agent.py:699-711)."""
        return self._ckpt.restore(os.path.join(self.path(step), name))

    def steps(self) -> list[int]:
        """Completed checkpoints only: a directory without its meta.json
        marker is an in-flight or crashed write and is not listed."""
        out = []
        if not os.path.isdir(self.output_dir):
            return out
        for name in os.listdir(self.output_dir):
            m = re.fullmatch(r"checkpoint-(\d+)", name)
            if m and os.path.exists(os.path.join(self.output_dir, name, "meta.json")):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None
