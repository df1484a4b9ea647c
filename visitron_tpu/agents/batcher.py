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
    ):
        self.instances = instances[host_id::num_hosts]
        self.runtime = runtime
        self.batch_size = batch_size
        self.path_type = path_type
        self.rng = np.random.default_rng(seed)
        # Length-grouped shuffling: within each shuffled window of
        # ``length_sort_window`` batches, instances are ordered by dialog
        # length so batches are length-homogeneous.  Combined with the
        # agents' 128-multiple length bucketing (trim_batch), this recovers
        # the work-skipping the reference gets from pack_padded_sequence
        # (agent.py:151-184) — a random batch is otherwise padded to its
        # single longest dialog.  0/1 disables (plain shuffled batches).
        self.length_sort_window = length_sort_window

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

    def _shuffled_epoch(self) -> list[int]:
        epoch = np.arange(len(self.instances))
        self.rng.shuffle(epoch)
        w = self.length_sort_window * self.batch_size
        if self.length_sort_window <= 1 or len(epoch) <= self.batch_size:
            return epoch.tolist()
        lengths = np.array([self.instances[i].length for i in epoch])
        out: list[int] = []
        for s in range(0, len(epoch), w):
            chunk, cl = epoch[s:s + w], lengths[s:s + w]
            out.extend(chunk[np.argsort(cl, kind="stable")].tolist())
        return out

    def train_batches(self, num_batches: int, episode_len: int | None = None):
        """Infinite-style epoch-shuffled iterator; every batch full-size."""
        order: list[int] = []
        produced = 0
        while produced < num_batches:
            while len(order) < self.batch_size:
                order.extend(self._shuffled_epoch())
            take, order = order[: self.batch_size], order[self.batch_size:]
            batch = self._make_batch([self.instances[i] for i in take])
            if episode_len is not None:
                batch = self.with_teacher(batch, episode_len)
            produced += 1
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
