"""Checkpoint manager: orbax-backed, reference directory-layout parity.

The reference writes ``checkpoint-{iter}`` directories with separate encoder/
decoder state dicts + training args (train.py:151-163) or HF save_pretrained
trees (pretrain.py:257-270); eval enumerates them by iteration
(train.py:182-189).  We keep the ``checkpoint-{iter}`` naming with orbax
StandardCheckpointer payloads (params + optimizer state + step + config),
which adds what the reference lacked: exact training-state resume.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def path(self, step: int) -> str:
        return os.path.join(self.output_dir, f"checkpoint-{step}")

    def save(self, step: int, params, opt_state=None, extra: dict | None = None) -> str:
        """Each component is a separate orbax payload so callers can restore
        parameters without the optimizer state (eval paths)."""
        path = self.path(step)
        self._ckpt.save(os.path.join(path, "params"), params, force=True)
        if opt_state is not None:
            self._ckpt.save(os.path.join(path, "opt_state"), opt_state, force=True)
        self._ckpt.wait_until_finished()
        meta = {"step": step}
        meta.update(extra or {})
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
        return path

    def restore(self, step: int, template) -> dict:
        """Restore components named by ``template`` keys ("params",
        "opt_state") into their structures."""
        out = {}
        for name, tmpl in template.items():
            target = jax.tree.map(np.asarray, tmpl)
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
        out = []
        if not os.path.isdir(self.output_dir):
            return out
        for name in os.listdir(self.output_dir):
            m = re.fullmatch(r"checkpoint-(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None
