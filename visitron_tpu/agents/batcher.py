"""Batching of navigation instances for agents.

Replaces the torch DataLoader + DistributedSampler + batch-padding machinery
(train.py:66-70, agent.py:253-276) with a deterministic numpy batcher:
  * fixed batch size, short batches padded by wrapping into the next epoch
    (_verify_batch_size parity);
  * per-host sharding hook for multi-host data parallelism (each host takes a
    strided slice of the instance list, the DistributedSampler equivalent).
"""

from __future__ import annotations

import numpy as np

from visitron_tpu import geometry as geo
from visitron_tpu.agents.runtime import NavRuntime
from visitron_tpu.data.datasets import NavInstance


def trim_to_bucket(batch: dict, max_len: int, bucket: int) -> dict:
    """Trim the dialog arrays (ids/segs) to ``max_len`` rounded up to a
    ``bucket`` multiple.  The ONE trimming rule shared by single-host
    length-bucketing (ViewpointAgent.trim_batch: local max, bucket 128) and
    multi-host global bucketing (NavEpisodeBatcher._global_trim: global max
    across every host's concurrent batch) — both sides must slice the same
    keys to the same rule or multi-host global shapes desync."""
    s_full = batch["ids"].shape[1]
    s = int(min(s_full, -(-int(max(1, max_len)) // bucket) * bucket))
    if s == s_full:
        return batch
    out = dict(batch)
    out["ids"] = batch["ids"][:, :s]
    out["segs"] = batch["segs"][:, :s]
    return out


class NavEpisodeBatcher:
    def __init__(
        self,
        instances: list[NavInstance],
        runtime: NavRuntime,
        batch_size: int,
        path_type: str = "trusted_path",
        seed: int = 88,
        host_id: int = 0,
        num_hosts: int = 1,
        length_sort_window: int = 8,
        length_bucket: int = 128,
    ):
        self.instances_all = instances
        self.instances = instances[host_id::num_hosts]
        self.runtime = runtime
        self.batch_size = batch_size
        self.path_type = path_type
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.rng = np.random.default_rng(seed)
        # Length-grouped shuffling: within each shuffled window of
        # ``length_sort_window`` batches, instances are ordered by dialog
        # length so batches are length-homogeneous.  Combined with the
        # agents' 128-multiple length bucketing (trim_batch), this recovers
        # the work-skipping the reference gets from pack_padded_sequence
        # (agent.py:151-184) — a random batch is otherwise padded to its
        # single longest dialog.  0/1 disables (plain shuffled batches).
        self.length_sort_window = length_sort_window
        # Multi-host: batches are trimmed by the batcher itself to the GLOBAL
        # length bucket (max dialog length across every host's concurrent
        # batch, rounded up to a ``length_bucket`` multiple).  The schedule is
        # deterministic given (instances, seed), so each host derives every
        # other host's batch lengths by simulating their shards' index
        # streams — no collective needed, and all hosts present identical
        # global array shapes to the SPMD step.
        self.length_bucket = length_bucket
        self._streams = None
        self._shards = None

    def _make_batch(self, items: list[NavInstance]) -> dict:
        rt = self.runtime
        b = len(items)
        s = len(items[0].token_ids)
        out = {
            "ids": np.zeros((b, s), np.int32),
            "segs": np.zeros((b, s), np.int32),
            "lengths": np.zeros((b,), np.int32),
            "scans": [it.scan for it in items],
            "inst_idx": [it.inst_idx for it in items],
            "start_rows": np.zeros((b,), np.int32),
            "start_views": np.zeros((b,), np.int32),
            "goal_rows": np.zeros((b,), np.int32),
        }
        for i, it in enumerate(items):
            out["ids"][i] = it.token_ids
            out["segs"][i] = it.segment_ids
            out["lengths"][i] = it.length
            path = it.path(self.path_type)
            # Episodes always start at elevation 0 regardless of the dataset's
            # start_pano elevation (reference EnvBatch.newEpisodes passes
            # [0]*batch, data_loader.py:52).
            row, view = rt.start_state(it.scan, path[0], it.start_pano["heading"], 0.0)
            out["start_rows"][i] = row
            out["start_views"][i] = view
            out["goal_rows"][i] = rt.row(it.scan, path[-1])
        return out

    def with_teacher(self, batch: dict, episode_len: int) -> dict:
        batch = dict(batch)
        batch.update(
            self.runtime.teacher_rollout_arrays(
                batch["scans"], batch["start_rows"], batch["start_views"],
                batch["goal_rows"], episode_len))
        return batch

    def with_sample_teacher(self, batch: dict) -> dict:
        """Device-side teacher columns for student-forced training."""
        batch = dict(batch)
        batch.update(self.runtime.sample_rollout_arrays(
            batch["scans"], batch["goal_rows"]))
        return batch

    def with_turn_teacher(self, batch: dict, episode_len: int) -> dict:
        batch = dict(batch)
        batch.update(
            self.runtime.turn_based_rollout_arrays(
                batch["scans"], batch["start_rows"], batch["start_views"],
                batch["goal_rows"], episode_len))
        return batch

    def _window_sort(self, idx: list[int], shard) -> list[int]:
        """Length-sort ``idx`` within windows of ``length_sort_window``
        batches, starting at index 0 so window boundaries stay aligned to
        batch boundaries (a carried epoch tail is re-windowed with the next
        epoch instead of offsetting it)."""
        w = self.length_sort_window * self.batch_size
        if self.length_sort_window <= 1 or len(idx) <= self.batch_size:
            return list(idx)
        arr = np.asarray(idx)
        lengths = np.array([shard[i].length for i in arr])
        out: list[int] = []
        for s in range(0, len(arr), w):
            chunk, cl = arr[s:s + w], lengths[s:s + w]
            out.extend(chunk[np.argsort(cl, kind="stable")].tolist())
        return out

    def _batch_stream(self, shard, rng):
        """Yield ``batch_size`` index lists into ``shard``: epoch-shuffled,
        window-aligned length-sorted, tail wrapped into the next epoch."""
        order: list[int] = []
        while True:
            while len(order) < self.batch_size:
                epoch = np.arange(len(shard))
                rng.shuffle(epoch)
                order = self._window_sort(order + epoch.tolist(), shard)
            take, order = order[: self.batch_size], order[self.batch_size:]
            yield take

    def _ensure_streams(self) -> None:
        if self._streams is not None:
            return
        if self.num_hosts > 1:
            self._shards = [self.instances_all[h::self.num_hosts]
                            for h in range(self.num_hosts)]
            # Own shard consumes self.rng (identical to a fresh rng(seed) at
            # this point); shadow hosts get fresh rngs with the same seed —
            # exactly what each of them runs locally.
            self._streams = [
                self._batch_stream(sh, self.rng if h == self.host_id
                                   else np.random.default_rng(self.seed))
                for h, sh in enumerate(self._shards)]
        else:
            self._shards = [self.instances]
            self._streams = [self._batch_stream(self.instances, self.rng)]

    def _global_trim(self, batch: dict, global_max_len: int) -> dict:
        return trim_to_bucket(batch, global_max_len, self.length_bucket)

    def skip_batches(self, n: int) -> None:
        """Advance the deterministic schedule by ``n`` batches without
        building them (index draws only — cheap).  Exact resume: a restarted
        process replays the stream to its checkpoint position so training
        continues with the batches an uninterrupted run would have seen,
        instead of restarting the epoch shuffle from scratch.  Multi-host:
        the shadow streams advance in lockstep, so the derived global length
        buckets stay identical across hosts after resume."""
        self._ensure_streams()
        for _ in range(n):
            for s in self._streams:
                next(s)

    def train_batches(self, num_batches: int, episode_len: int | None = None):
        """Infinite-style epoch-shuffled iterator; every batch full-size.
        Schedule state persists across calls (the epoch tail wraps)."""
        self._ensure_streams()
        my = self.host_id if self.num_hosts > 1 else 0
        for _ in range(num_batches):
            takes = [next(s) for s in self._streams]
            batch = self._make_batch(
                [self._shards[my][i] for i in takes[my]])
            if self.num_hosts > 1:
                gmax = max(self._shards[h][i].length
                           for h, t in enumerate(takes) for i in t)
                batch = self._global_trim(batch, int(gmax))
            if episode_len is not None:
                batch = self.with_teacher(batch, episode_len)
            yield batch

    def eval_batches(self, episode_len: int | None = None):
        """One sequential pass; the final batch wraps to the front (the test
        loop dedupes repeats, agent.py:49-63)."""
        n = len(self.instances)
        for start in range(0, n, self.batch_size):
            idx = [(start + j) % n for j in range(self.batch_size)]
            batch = self._make_batch([self.instances[i] for i in idx])
            if episode_len is not None:
                batch = self.with_teacher(batch, episode_len)
            yield batch
