"""Async checkpoint saves + crash-consistent enumeration.

``--async_checkpoints`` overlaps orbax's background commit with subsequent
train steps; ``meta.json`` is the completeness marker — it is written only
once the payload is durable, and ``steps()`` lists only marked checkpoints,
so ``--resume`` can never pick up a half-written directory (e.g. a process
killed mid-save, which the preemption grace window makes a real scenario).
"""

import json
import os

import numpy as np

from visitron_tpu.train.checkpoint import CheckpointManager


def _tree(x):
    return {"w": np.full((4, 4), x, np.float32), "b": np.arange(4, dtype=np.float32)}


def test_async_save_commits_marker_on_flush(tmp_path):
    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(1, _tree(1.0))
    # The marker is deferred until the write is known durable; an async save
    # is not yet eligible for resume.
    assert not os.path.exists(os.path.join(mgr.path(1), "meta.json"))
    mgr.wait_until_finished()
    assert mgr.steps() == [1]
    restored = mgr.restore(1, {"params": _tree(0.0)})
    np.testing.assert_array_equal(restored["params"]["w"], _tree(1.0)["w"])


def test_async_save_chain_commits_previous(tmp_path):
    """A new save flushes the previous one first (orbax serializes saves),
    so markers always land in order."""
    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(1, _tree(1.0))
    mgr.save(2, _tree(2.0))
    assert 1 in mgr.steps()  # save(2) committed checkpoint-1's marker
    mgr.wait_until_finished()
    assert mgr.steps() == [1, 2]


def test_wait_true_overrides_async(tmp_path):
    """The preemption / final save passes wait=True: durable + marked before
    the call returns, even on an async manager (the process exits next)."""
    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(3, _tree(3.0), wait=True)
    assert mgr.steps() == [3]


def test_unmarked_checkpoint_dir_not_listed(tmp_path):
    """A directory without meta.json (in-flight or crashed write) is
    invisible to steps()/latest(); marking it makes it appear."""
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(10, _tree(1.0))
    half = os.path.join(str(tmp_path), "checkpoint-20")
    os.makedirs(os.path.join(half, "params"))
    assert mgr.steps() == [10]
    assert mgr.latest() == 10
    with open(os.path.join(half, "meta.json"), "w") as f:
        json.dump({"step": 20}, f)
    assert mgr.steps() == [10, 20]
