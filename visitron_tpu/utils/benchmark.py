"""Honest on-device step timing for remote-attached (relay/tunnel) TPUs.

On a locally-attached TPU, ``dispatch; jax.block_until_ready(out)`` measures
device time.  On a remote PJRT relay (this environment's tunneled chip),
``block_until_ready`` can return immediately — results materialize only when
bytes are fetched — so host-side loops measure *enqueue/RPC* time, not
compute.  (Measured here: a chained 4096^3-matmul loop "timed" at 0.02 ms by
block_until_ready vs 0.72 ms true — 97% of v5e peak — once timed on device.)

The robust recipe, used by :func:`time_step_fn`:

  1. run N iterations of the step inside ONE jitted ``lax.fori_loop``,
  2. force a real sync by fetching one scalar to the host (``float()``),
  3. difference two iteration counts to cancel the RPC/dispatch constant.

This measures pure device step time — the number that matters for chip
throughput — and is identical to host-loop timing on non-relay hardware.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

# Peak dense bf16 FLOP/s per chip by device kind (public spec sheets) —
# shared by bench.py and tools/ so the MFU denominator cannot drift.
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


class TimingWindowCollapsed(RuntimeError):
    """A two-point timing window differenced to <= 0 even after the warm-up
    retry — the measurement is invalid and must not be published.  Raised by
    :func:`time_step_fn` / :func:`time_fn` so every benchmark tool refuses
    rather than records a 1e-9-clamped (absurd-throughput) reading."""


def stack_batches(batches: list) -> dict:
    """Stack a list of same-shape batch dicts into one leading-dim pytree."""
    import numpy as np

    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def time_step_fn(step_fn: Callable, state, stacked_batches, *, n_lo: int = 5,
                 n_hi: int = 25, repeats: int = 3, detail: bool = False,
                 extra_args: tuple = ()):
    """Per-step milliseconds of ``step_fn(state, batch) -> (state, scalar)``.

    ``stacked_batches``: pytree whose leaves carry a leading "batch pool" dim;
    iteration i uses pool entry ``i % pool``.  The loop runs on device inside
    one jit; per-step time = (t(n_hi) - t(n_lo)) / (n_hi - n_lo), min over
    ``repeats`` (min is the right statistic for a quiet-device estimate).

    ``detail=True`` additionally returns the per-repeat window estimates
    (each repeat's t_hi against the best t_lo) so callers can report spread —
    the remote-relay chip carries ~±25% external-load variance between
    windows, and the official bench records best + spread.

    ``extra_args``: additional pytrees passed through to
    ``step_fn(state, batch, *extra_args)`` as TRACED loop arguments — use for
    device-resident tables (e.g. NavRuntime) so they are never embedded in
    the loop program as HLO constants.

    PITFALL: the pool must contain >= 2 batches with DIFFERENT contents.
    With a single (or identical) batch the gather is loop-invariant and XLA
    can hoist any batch-only subcomputation out of the fori_loop — measured
    on the classifier step, whose frozen deterministic-params encode
    collapsed from 19 ms to 0.5 ms/step with a pool of one.  Real training
    feeds a different batch every step; the pool must too.
    """
    pool = jax.tree.leaves(stacked_batches)[0].shape[0]

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def loop(state, batches, n, *extra):
        def body(i, carry):
            state, _ = carry
            batch = jax.tree.map(lambda x: x[i % pool], batches)
            return step_fn(state, batch, *extra)

        zero = jnp.zeros((), jnp.float32)
        state, last = jax.lax.fori_loop(0, n, body, (state, zero))
        return jnp.asarray(last, jnp.float32)

    def run(n):
        times = []
        # compile + warm
        float(loop(state, stacked_batches, n, *extra_args))
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(state, stacked_batches, n, *extra_args))
            times.append(time.perf_counter() - t0)
        return times

    t_lo = min(run(n_lo))
    t_his = run(n_hi)
    if min(t_his) <= t_lo:
        # Relay warm-up guard: the FIRST fetches of a process carry seconds
        # of one-time tunnel setup, so an early t_lo can exceed t_hi and the
        # difference clamps to ~0 — reporting absurd throughput (seen as the
        # first probe of bench.py's secondary block).  The connection is warm
        # now; one re-measure of both ends restores a valid window.
        t_lo = min(run(n_lo))
        t_his = run(n_hi)
    if min(t_his) <= t_lo:
        # Still collapsed after the retry: refuse rather than publish the
        # 1e-9-clamped nonsense (a 0.000-ms step reads as absurd throughput).
        raise TimingWindowCollapsed(
            f"timing window collapsed after retry: t_lo={t_lo:.4f}s, "
            f"min(t_hi)={min(t_his):.4f}s over n_lo={n_lo}, n_hi={n_hi}")
    windows = [max(t - t_lo, 1e-9) / (n_hi - n_lo) * 1000.0 for t in t_his]
    if detail:
        return min(windows), windows
    return min(windows)


def time_fn(fn: Callable, *args, n_lo: int = 5, n_hi: int = 25,
            repeats: int = 3) -> float:
    """Per-call milliseconds of a stateless ``fn(*args) -> pytree``.

    Each iteration's inputs are perturbed by ``acc * 1e-38`` (numerically nil,
    but a real data dependence on the previous iteration's output), so XLA can
    neither hoist the body out of the loop (LICM) nor dead-code it.  Integer
    and bool args get ``+ isnan(acc)`` (always 0, never foldable) for the
    same reason — without it a uint8 input (e.g. skybox faces) is
    loop-invariant and everything computed from it alone gets hoisted,
    silently timing an empty loop.
    """
    import functools

    flat, treedef = jax.tree.flatten(args)

    @functools.partial(jax.jit, static_argnums=1)
    def loop(flat, n):
        def body(i, carry):
            flat, acc = carry
            args_i = jax.tree.unflatten(treedef, flat)
            out = fn(*args_i)
            acc = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)) + acc * 0.5
            eps = acc * 1e-38  # non-foldable, numerically negligible
            izero = jnp.isnan(acc)  # always False, never foldable
            new_flat = [
                x + eps.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else (x if jnp.issubdtype(x.dtype, jnp.bool_)
                      else x + izero.astype(x.dtype))
                for x in flat
            ]
            return new_flat, acc

        flat, acc = jax.lax.fori_loop(0, n, body, (flat, jnp.zeros((), jnp.float32)))
        return acc

    def run(n):
        best = float("inf")
        float(loop(flat, n))
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(flat, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(n_lo), run(n_hi)
    if t_hi <= t_lo:
        # Relay warm-up guard (see time_step_fn): re-measure on a warm link.
        t_lo, t_hi = run(n_lo), run(n_hi)
    if t_hi <= t_lo:
        raise TimingWindowCollapsed(
            f"timing window collapsed after retry: t_lo={t_lo:.4f}s, "
            f"t_hi={t_hi:.4f}s over n_lo={n_lo}, n_hi={n_hi}")
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000.0
