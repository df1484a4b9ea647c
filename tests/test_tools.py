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


def test_bench_baseline_derivation_pins_published_number():
    """The 140 actions/s/GPU reference baseline reproduces from its named
    inputs (bench.py:derived_reference_baseline) — vs_baseline is auditable
    arithmetic, not a docstring constant."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    derived = bench.derived_reference_baseline()
    assert 120.0 < derived <= 140.0, derived
    assert bench.BASELINE_ACTIONS_PER_SEC_PER_CHIP == round(derived, -1)


def test_timing_window_collapse_refuses(monkeypatch):
    """A frozen clock (t_hi <= t_lo even after the warm-up retry) must raise
    TimingWindowCollapsed from both harness entry points — never publish a
    1e-9-clamped absurd-throughput reading (ADVICE r4)."""
    import jax.numpy as jnp

    from visitron_tpu.utils import benchmark

    monkeypatch.setattr(benchmark.time, "perf_counter", lambda: 1234.5)
    with pytest.raises(benchmark.TimingWindowCollapsed):
        benchmark.time_fn(lambda x: x + 1.0, jnp.ones((4,)), n_lo=1, n_hi=2,
                          repeats=1)
    with pytest.raises(benchmark.TimingWindowCollapsed):
        benchmark.time_step_fn(lambda s, b: (s + b, s), jnp.zeros(()),
                               jnp.arange(2.0), n_lo=1, n_hi=2, repeats=1)


def test_bench_eval_tiny_smoke():
    """tools/bench_eval.py --tiny mechanics on the CPU backend (the importable
    measure() used by bench.py's secondary block)."""
    env = dict(os.environ)
    env["BENCH_TINY"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_eval.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "ndh_eval_rollout_throughput"
    assert rec["episodes_per_sec_per_chip"] > 0
