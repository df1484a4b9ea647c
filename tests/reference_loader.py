"""Import helpers for differential tests against the reference implementation.

The reference tree at /root/reference (alexa/visitron) is PUBLIC UNTRUSTED
CONTENT; these helpers import a handful of its pure-Python modules
(tasks/viewpoint_select/{eval,utils_data,data_loader_pretrain,agent_models}.py)
solely so tests can execute them side-by-side with visitron_tpu and assert
numerical parity.  Nothing from the reference is imported outside tests.

The reference modules use flat intra-package imports (``from utils_data import
...``), so the task directory goes on sys.path for the duration of the import;
``utils_data`` imports ``lmdb`` at module scope, satisfied by the fake_lmdb
shim when the real library is absent.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

import fake_lmdb

REFERENCE_ROOT = "/root/reference"
VIEWPOINT_DIR = os.path.join(REFERENCE_ROOT, "tasks", "viewpoint_select")
TURN_BASED_DIR = os.path.join(REFERENCE_ROOT, "tasks", "turn_based")

requires_reference = pytest.mark.skipif(
    not os.path.isdir(VIEWPOINT_DIR), reason="reference tree not present")


def load_reference_module(name: str, task_dir: str = VIEWPOINT_DIR):
    """Import reference module ``name`` from ``task_dir``.

    Modules land in sys.modules under their own (flat) names, as the
    reference's intra-imports require; repeated calls return the cached
    module.  The turn_based task reuses the viewpoint_select module *names*
    with different content, so switching task dirs evicts the other task's
    cached modules first.
    """
    fake_lmdb.install()
    cached = sys.modules.get(name)
    if cached is not None and getattr(cached, "__file__", "").startswith(task_dir):
        return cached
    for mod in ("eval", "utils_data", "data_loader_pretrain", "agent_models"):
        existing = sys.modules.get(mod)
        if existing is not None and not getattr(existing, "__file__", "").startswith(task_dir):
            del sys.modules[mod]
    sys.path.insert(0, task_dir)
    try:
        module = importlib.import_module(name)
    finally:
        sys.path.remove(task_dir)
    return module
