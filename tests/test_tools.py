"""Wiring tests for the public measurement tools (CPU backend).

The bench tools are the official throughput interface (VALIDATION.md); a
refactor that silently breaks one would only be noticed at the next TPU
session.  BENCH_TASKS_SMALL runs the identical code path at toy dims.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


@pytest.mark.slow
def test_bench_tasks_small_mode():
    env = dict(os.environ)
    env["BENCH_TASKS_SMALL"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_tasks.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    metrics = {json.loads(l)["metric"] for l in lines}
    assert metrics == {
        "turn_based_train_examples_per_sec_per_chip",
        "classifier_train_examples_per_sec_per_chip",
        "speaker_train_examples_per_sec_per_chip",
    }
    for l in lines:
        rec = json.loads(l)
        assert rec["value"] > 0 and rec["step_ms"] > 0
