"""Preemption-safe training: checkpoint-and-exit on SIGTERM.

TPU pods (and most cloud accelerator fleets) are preempted with a SIGTERM
grace window.  The reference stack has no story for this — checkpoints are
parameter-only and land only every ``saving_steps`` (train.py:151-163), so a
preemption loses up to a full save interval plus the optimizer state.  Here
every train loop runs under a :class:`PreemptionGuard`: the signal handler
only sets a flag (async-signal-safe — never raises into jit dispatch or an
in-flight orbax write), and the loop polls :meth:`should_stop` at its step
boundary, writes a full exact-resume checkpoint (params + optimizer state)
at the current iteration, and returns cleanly.  ``--resume`` then continues
from the exact step — including the data schedule, see
``NavEpisodeBatcher.skip_batches`` and ``PretrainDataset.set_epoch``.

Multi-host SPMD: a host that stops at step k while the others enqueue step
k+1 deadlocks the pod — the k+1 collectives wait forever for the missing
participant.  The signal is also not guaranteed to land on every host, or
to land between the same two steps.  So in multi-host runs the stop
decision is a CONSENSUS: every ``sync_every`` steps all hosts all-gather
their local flags (``multihost_utils.process_allgather`` — a device
collective, so it is ordered with the train-step collectives) and stop iff
any host latched.  All hosts evaluate the same predicate at the same step
index, so they all stop at the same boundary.  The all-gather fetch is a
host sync, which is why it runs every ``sync_every`` steps rather than
every step (per-step host syncs defeat async-dispatch overlap — see the
deferred loss fetches in train/finetune.py); single-host runs never pay it.
"""

from __future__ import annotations

import signal
import threading

import numpy as np


class PreemptionGuard:
    """Context manager that latches termination signals into a flag.

    Usage::

        with PreemptionGuard() as guard:
            for batch in batches:
                ...train step...
                it += 1
                if guard.should_stop(it):
                    ckpt.save(it, params, opt_state)
                    break

    * Handlers are installed only in the main thread (Python restricts
      ``signal.signal`` to it); elsewhere the guard is inert and ``fired``
      stays False.
    * A previously installed *callable* handler is chained after the flag is
      set, so external supervisors keep their semantics; SIG_DFL/SIG_IGN are
      not re-invoked (the default SIGTERM action would kill the process
      before the checkpoint happens — latching the flag IS the override).
    * Original handlers are restored on exit.
    * ``fired`` is the host-local latch; ``should_stop(it)`` is the stop
      decision train loops must use (identical to ``fired`` on one host,
      a cross-host consensus on many — see module docstring); ``stop``
      caches the last decision for post-loop code (skip-val, ``preempted``).
    """

    #: Multi-host consensus cadence (steps).  Bounds the latch-to-checkpoint
    #: delay at sync_every steps; irrelevant on a single host.
    SYNC_EVERY = 25

    def __init__(self, signals=(signal.SIGTERM,), sync_every: int | None = None):
        self._signals = tuple(signals)
        self._prev: dict = {}
        self._fired = False
        self._stop = False
        self._sync_every = int(sync_every or self.SYNC_EVERY)

    @property
    def fired(self) -> bool:
        """Host-local latch: a termination signal reached THIS process."""
        return self._fired

    @property
    def stop(self) -> bool:
        """Last :meth:`should_stop` decision (consensus value on multi-host)."""
        return self._stop

    def should_stop(self, it: int) -> bool:
        """Stop decision at step boundary ``it`` (1-based iteration count).

        Single-host: the local flag.  Multi-host: an all-host flag
        all-gather every ``sync_every`` steps — every host evaluates it at
        the same step index and gets the same answer, so a lone latched
        host never leaves the others hanging in the next collective.
        """
        if self._stop:
            return True
        import jax

        if jax.process_count() == 1:
            self._stop = self._fired
        elif it % self._sync_every == 0:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(self._fired, np.uint8))
            self._stop = bool(np.asarray(flags).any())
        return self._stop

    def _handle(self, signum, frame):
        self._fired = True
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._handle)
        return self

    def __exit__(self, *exc) -> bool:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
        return False
