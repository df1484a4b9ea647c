"""Speaker agent: trajectory -> instruction generation + data augmentation.

The reference ships SpeakerEncoder/SpeakerDecoder unwired
(tasks/viewpoint_select/agent_models.py:512-629) — remnants of the
speaker-follower / EnvDrop line of work.  Here they are wired into a full
TPU-native capability the reference never had:

  * train a speaker on the task data's (teacher trajectory -> dialog text)
    pairs — trajectory features come from the same packed NavRuntime tables
    the nav agents use, so the whole train step (feature gathers, encoder,
    word-level CE, backward, Adam) is ONE jitted program;
  * greedily decode instructions for arbitrary shortest-path walks sampled
    from the nav graphs, emitting R2R-format JSON records
    (scan/path/heading/instructions) that ``build_aug_instances`` /
    ``--aug_data`` feed back into viewpoint fine-tuning (EnvDrop-style
    back-translation augmentation).
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visitron_tpu import geometry as geo
from visitron_tpu.agents.runtime import NavRuntime
from visitron_tpu.models.speaker import SpeakerDecoder, SpeakerEncoder


@dataclass
class SpeakerAgent:
    runtime: NavRuntime
    feature_dim: int                 # scene feature dim D (without angle feat)
    vocab_size: int
    bos_id: int                      # [CLS] starts decoding
    eos_id: int                      # [SEP] ends decoding
    pad_id: int = 0
    episode_len: int = 10
    max_words: int = 64
    angle_feat_size: int = 4
    hidden_size: int = 512
    wemb: int = 256
    dropout: float = 0.5
    learning_rate: float = 1e-4
    seed: int = 88
    movement_frame: bool = False     # action angle feats relative to the
                                     # previous MOVE's exact heading (turn
                                     # deltas), not the snapped current view
    feat_dropout: float = 0.0        # EnvDrop-style feature dropout on the
                                     # VISUAL dims only (angle feats kept),
                                     # one mask per episode

    def __post_init__(self):
        f = self.feature_dim + self.angle_feat_size
        self.encoder = SpeakerEncoder(feature_size=f, hidden_size=self.hidden_size,
                                      dropout_ratio=self.dropout)
        self.decoder = SpeakerDecoder(vocab_size=self.vocab_size,
                                      embedding_size=self.wemb,
                                      hidden_size=self.hidden_size,
                                      dropout_ratio=self.dropout)
        self.optimizer = optax.adam(self.learning_rate)
        self._train_step = None
        self._generate = None

    # -- trajectory features (device-side, from NavRuntime tables) ----------
    def _traj_feats(self, rt, cur_row, view, teacher, active):
        """(B, T) int arrays -> (action_embeds (B, T, F), pano (B, T, 36, F)).

        Per step, the action embedding is the taken candidate's scene feature
        + its relative angle feature (zero at/after stop), and the panorama is
        the 36-view feature grid at the current state — the EnvDrop speaker's
        input contract, built by pure gathers.  ``rt`` is a jit argument
        (pytree), never a closure — closures embed the tables as constants.
        """
        b, t = cur_row.shape
        rows = cur_row.reshape(-1)
        views = view.reshape(-1)
        pano = rt.feats[rows]                                # (BT, 36, D)
        f_t = jnp.concatenate([pano, rt.pano_af[views]], -1)  # (BT, 36, D+4)
        counts = rt.count[rows]
        slot = jnp.clip(teacher.reshape(-1), 0, rt.max_candidates - 1)
        pts = jnp.take_along_axis(rt.point[rows], slot[:, None], 1)[:, 0]
        a_vis = jnp.take_along_axis(pano, pts[:, None, None], 1)[:, 0]  # (BT, D)
        abs_h = jnp.take_along_axis(rt.heading[rows], slot[:, None], 1)[:, 0]
        if self.movement_frame:
            # Turn-delta frame: the angle feature is the taken candidate's
            # heading relative to the PREVIOUS move's exact heading (step 0:
            # the snapped start view) — the quantity turn-by-turn language
            # encodes.  The default frame references the snapped current
            # view, burying the delta under +-15 deg grid noise the LSTM
            # must integrate across steps to undo.
            abs_bt = abs_h.reshape(b, t)
            start = ((view[:, 0] % geo.HEADINGS_PER_ROW).astype(abs_h.dtype)
                     * geo.ANGLE_INC)
            prev = jnp.concatenate([start[:, None], abs_bt[:, :-1]], axis=1)
            ch = (abs_bt - prev).reshape(-1)
        else:
            base_heading = ((views % geo.HEADINGS_PER_ROW).astype(a_vis.dtype)
                            * geo.ANGLE_INC)
            ch = abs_h - base_heading
        ce = jnp.take_along_axis(rt.elev[rows], slot[:, None], 1)[:, 0]
        a_af = jnp.stack([jnp.sin(ch), jnp.cos(ch), jnp.sin(ce), jnp.cos(ce)], -1)
        a_t = jnp.concatenate([a_vis, a_af.astype(a_vis.dtype)], -1)  # (BT, D+4)
        # Stop step (teacher == count) and ended steps embed as zeros.
        stopped = (teacher.reshape(-1) >= counts) | (active.reshape(-1) == 0)
        a_t = jnp.where(stopped[:, None], 0.0, a_t)
        f = self.feature_dim + self.angle_feat_size
        return (a_t.reshape(b, t, f).astype(jnp.float32),
                f_t.reshape(b, t, geo.NUM_VIEWS, f).astype(jnp.float32))

    # -- parameter init -----------------------------------------------------
    def init_state(self) -> dict:
        f = self.feature_dim + self.angle_feat_size

        @jax.jit
        def init(rng):
            r1, r2 = jax.random.split(rng)
            enc = self.encoder.init(
                r1, jnp.zeros((1, self.episode_len, f)),
                jnp.zeros((1, self.episode_len, geo.NUM_VIEWS, f)),
                jnp.array([self.episode_len]))
            dec = self.decoder.init(
                r2, jnp.zeros((1, 2), jnp.int32),
                jnp.zeros((1, self.episode_len, self.hidden_size)),
                jnp.zeros((1, self.episode_len), bool),
                jnp.zeros((1, self.hidden_size)), jnp.zeros((1, self.hidden_size)))
            return {"encoder": enc, "decoder": dec}

        params = init(jax.random.PRNGKey(self.seed))
        return {"params": params,
                "opt_state": jax.jit(self.optimizer.init)(params),
                "rng": jax.random.PRNGKey(self.seed + 1)}

    # -- loss ---------------------------------------------------------------
    def _word_ce(self, rt, params, batch, rng, deterministic):
        """Teacher-forced per-token word CE over (trajectory -> words) pairs.

        batch: cur_row/view/teacher/active (B, T) + words (B, L) padded with
        pad_id; words[:, 0] is BOS, the CE covers words[:, 1:].  Returns
        (ce, valid), both (B, L-1).
        """
        a_t, f_t = self._traj_feats(rt, batch["cur_row"], batch["view"],
                                    batch["teacher"], batch["active"])
        lengths = batch["active"].sum(axis=1).astype(jnp.int32)
        r1, r2, rfd = jax.random.split(rng, 3)
        if not deterministic and self.feat_dropout > 0.0:
            # EnvDrop speaker featdrop (speaker.py in airsplay/R2R-EnvDrop):
            # drop VISUAL feature dims only — the angle features survive, so
            # the model is pushed toward the geometry that generalizes
            # instead of memorizing per-viewpoint visual noise.  One mask per
            # episode (consistent across steps/views), environmental-dropout
            # style.
            keep = jax.random.bernoulli(
                rfd, 1.0 - self.feat_dropout,
                (a_t.shape[0], 1, self.feature_dim)).astype(a_t.dtype)
            scale = keep / (1.0 - self.feat_dropout)
            a_t = jnp.concatenate(
                [a_t[..., : self.feature_dim] * scale,
                 a_t[..., self.feature_dim:]], -1)
            f_t = jnp.concatenate(
                [f_t[..., : self.feature_dim] * scale[:, :, None, :],
                 f_t[..., self.feature_dim:]], -1)
        ctx = self.encoder.apply(params["encoder"], a_t, f_t, lengths,
                                 deterministic=deterministic,
                                 rngs=None if deterministic else {"dropout": r1})
        t = batch["active"].shape[1]
        ctx_mask = jnp.arange(t)[None, :] >= lengths[:, None]
        words = batch["words"]
        b = words.shape[0]
        h0 = jnp.zeros((b, self.hidden_size))
        logits, _, _ = self.decoder.apply(
            params["decoder"], words[:, :-1], ctx, ctx_mask, h0, h0,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": r2})
        targets = words[:, 1:]
        valid = (targets != self.pad_id).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), targets)
        return ce, valid

    def _loss(self, rt, params, batch, rng, deterministic):
        """Global token-mean word CE (the training objective)."""
        ce, valid = self._word_ce(rt, params, batch, rng, deterministic)
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def train_step_fn(self):
        if self._train_step is not None:
            return self._train_step

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rt):
            rng, step_rng = jax.random.split(state["rng"])
            loss, grads = jax.value_and_grad(
                lambda p: self._loss(rt, p, batch, step_rng, False))(state["params"])
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "opt_state": opt_state, "rng": rng}, loss

        def run(state, batch):
            return step(state, batch, self.runtime)

        self._train_step = run
        self._train_step_jit = step
        return run

    def train_step_jit(self):
        """Raw jitted train step ``(state, batch, rt)`` — for AOT lowering
        and on-device-loop benchmarking (ViewpointAgent contract)."""
        self.train_step_fn()
        return self._train_step_jit

    def eval_loss_fn(self):
        """Deterministic word-CE on held-out (trajectory, text) pairs."""
        if getattr(self, "_eval_loss", None) is None:
            @jax.jit
            def f(params, batch, rt):
                return self._loss(rt, params, batch, jax.random.PRNGKey(0), True)

            self._eval_loss = lambda params, batch: f(params, batch, self.runtime)
        return self._eval_loss

    def caption_ce_fn(self):
        """Per-example deterministic word-CE — the speaker's self-score of a
        caption against its own trajectory (EnvDrop-style quality signal:
        lower = the caption is likelier under the model that produced it)."""
        if getattr(self, "_caption_ce", None) is None:
            @jax.jit
            def f(params, batch, rt):
                ce, valid = self._word_ce(rt, params, batch,
                                          jax.random.PRNGKey(0), True)
                return (ce * valid).sum(1) / jnp.maximum(valid.sum(1), 1.0)

            self._caption_ce = lambda params, batch: f(params, batch, self.runtime)
        return self._caption_ce

    # -- generation ---------------------------------------------------------
    def generate_fn(self, temperature: float = 0.0):
        """Decode: (params, traj batch[, rng]) -> (B, max_words) ids.

        ``temperature`` 0 = greedy argmax; > 0 samples from the softmax at
        that temperature (EnvDrop samples its augmentation captions for
        diversity — one caption per walk, but varied across walks/runs)."""
        key = ("generate", temperature)
        if key in getattr(self, "_generate_cache", {}):
            return self._generate_cache[key]

        @jax.jit
        def generate(params, batch, rng, rt):
            a_t, f_t = self._traj_feats(rt, batch["cur_row"], batch["view"],
                                        batch["teacher"], batch["active"])
            lengths = batch["active"].sum(axis=1).astype(jnp.int32)
            ctx = self.encoder.apply(params["encoder"], a_t, f_t, lengths,
                                     deterministic=True)
            t = batch["active"].shape[1]
            ctx_mask = jnp.arange(t)[None, :] >= lengths[:, None]
            b = ctx.shape[0]
            h0 = jnp.zeros((b, self.hidden_size))

            def step(carry, step_rng):
                word, h, c, ended = carry
                logits, h1, c1 = self.decoder.apply(
                    params["decoder"], word[:, None], ctx, ctx_mask, h, c,
                    deterministic=True)
                lg = logits[:, 0].astype(jnp.float32)
                if temperature > 0.0:
                    nxt = jax.random.categorical(
                        step_rng, lg / temperature).astype(jnp.int32)
                else:
                    nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                nxt = jnp.where(ended, self.pad_id, nxt)
                new_ended = ended | (nxt == self.eos_id)
                return (nxt, h1, c1, new_ended), nxt

            bos = jnp.full((b,), self.bos_id, jnp.int32)
            (_, _, _, _), words = jax.lax.scan(
                step, (bos, h0, h0, jnp.zeros(b, bool)),
                jax.random.split(rng, self.max_words))
            return words.T  # (B, max_words)

        def run(params, batch, rng):
            return generate(params, batch, rng, self.runtime)

        if not hasattr(self, "_generate_cache"):
            self._generate_cache = {}
        self._generate_cache[key] = run
        return run

    # -- host-side helpers --------------------------------------------------
    @staticmethod
    def instance_text(inst) -> str:
        """Supervision text for a NavInstance: the dialog turns joined (NDH)
        or the instruction (R2R/R4R/RxR)."""
        raw = inst.raw or {}
        if isinstance(raw.get("dialog_history"), list):
            text = " ".join(t.get("message", "") for t in raw["dialog_history"]
                            if t.get("message"))
            return text or str(raw.get("target", ""))
        if raw.get("instructions"):
            return raw["instructions"][0]
        return str(raw.get("instruction", ""))

    def attach_words(self, batch: dict, tokenizer, text_by_idx: dict) -> dict:
        """Add the (B, max_words+1) word-id array to a teacher batch from a
        NavEpisodeBatcher (keyed by its inst_idx list)."""
        texts = [text_by_idx[i] for i in batch["inst_idx"]]
        out = {k: np.asarray(batch[k])
               for k in ("cur_row", "view", "teacher", "active")}
        out["words"] = self.words_batch(tokenizer, texts)
        return out

    def words_batch(self, tokenizer, texts: list[str]) -> np.ndarray:
        """Tokenize instruction texts to (B, max_words+1) id arrays
        ([BOS] w... [EOS] [PAD]...)."""
        out = np.full((len(texts), self.max_words + 1), self.pad_id, np.int32)
        for i, text in enumerate(texts):
            ids = tokenizer.encode(text)[: self.max_words - 1]
            row = [self.bos_id] + ids + [self.eos_id]
            out[i, : len(row)] = row
        return out

    def decode_words(self, tokenizer, ids) -> list[str]:
        """Ids -> text (strips specials, merges wordpieces)."""
        texts = []
        stop = {self.bos_id, self.eos_id, self.pad_id}
        for row in np.asarray(ids):
            toks = tokenizer.convert_ids_to_tokens(
                [int(i) for i in row if int(i) not in stop])
            words: list[str] = []
            for tk in toks:
                if tk.startswith("##") and words:
                    words[-1] += tk[2:]
                else:
                    words.append(tk)
            texts.append(" ".join(words))
        return texts

    def sample_walks(self, rng: np.random.Generator, n: int,
                     min_hops: int = 2, max_hops: int = 6) -> dict:
        """Random shortest-path walks over the nav graphs -> teacher batch
        (+ scans / path viewpoint ids / heading for the JSON records)."""
        rt = self.runtime
        scans = sorted(rt.graphs)
        recs = {"scans": [], "start_rows": [], "start_views": [],
                "goal_rows": [], "headings": []}
        attempts = 0
        max_attempts = max(1000, 200 * n)
        while len(recs["scans"]) < n:
            attempts += 1
            if attempts > max_attempts:
                raise RuntimeError(
                    f"sample_walks: no viewpoint pairs with hops in "
                    f"[{min_hops}, {max_hops}] after {attempts} attempts "
                    f"({len(recs['scans'])}/{n} found) — widen the hop range")
            scan = scans[rng.integers(len(scans))]
            g = rt.graphs[scan]
            off = rt.feat_table.scan_offsets[scan]
            u, v = rng.integers(g.num_viewpoints, size=2)
            if u == v or not np.isfinite(g.dist[u, v]):
                continue
            hops = len(g.shortest_path(int(u), int(v))) - 1
            if not (min_hops <= hops <= max_hops):
                continue
            heading = float(rng.uniform(0, 2 * np.pi))
            row = off + int(u)
            recs["scans"].append(scan)
            recs["start_rows"].append(row)
            recs["start_views"].append(
                geo.view_of(geo.snap_heading(heading), geo.snap_elevation(0.0)))
            recs["goal_rows"].append(off + int(v))
            recs["headings"].append(heading)
        return recs

    def augment(self, params, tokenizer, rng: np.random.Generator, n: int,
                batch_size: int = 32, min_hops: int = 2, max_hops: int = 6,
                prefix: str = "AUG", temperature: float = 0.0,
                keep_fraction: float | None = None,
                target_vocab: list[str] | None = None) -> list[dict]:
        """Generate R2R-format augmentation records from sampled walks.
        ``temperature`` > 0 samples captions (diversity) instead of greedy.

        ``keep_fraction`` in (0, 1] enables a quality gate: over-generate
        ``n / keep_fraction`` candidates, self-score each caption with the
        speaker's own teacher-forced per-example word CE against its walk
        (``caption_ce_fn``), and keep the ``n`` best (lowest CE).  Each
        returned record then carries a ``speaker_ce`` field.

        ``target_vocab`` stamps each record with a sampled ``target`` word so
        ``build_aug_instances`` can emit the NDH sequence format ([TAR] span)
        instead of the bare R2R format — without it, aug gradient trains the
        encoder on an input population the NDH val split never shows
        (tools/aug_ab.py measures the difference)."""
        gen = self.generate_fn(temperature)
        score = self.caption_ce_fn() if keep_fraction is not None else None
        target = n if keep_fraction is None else int(np.ceil(n / keep_fraction))
        rt = self.runtime
        records = []
        empty_rounds = 0
        while len(records) < target:
            if empty_rounds >= 5:
                raise RuntimeError(
                    f"augment: speaker produced empty captions for 5 "
                    f"consecutive batches ({len(records)}/{target} records) — "
                    "the checkpoint likely decodes EOS immediately; train "
                    "longer or raise --aug_temperature")
            # Always sample full batches: a shape-changing final partial batch
            # would trigger a fresh jit compile of ``gen``; surplus decoded
            # records are truncated host-side below.
            walks = self.sample_walks(rng, batch_size, min_hops, max_hops)
            arrays = rt.teacher_rollout_arrays(
                walks["scans"], np.asarray(walks["start_rows"], np.int32),
                np.asarray(walks["start_views"], np.int32),
                np.asarray(walks["goal_rows"], np.int32), self.episode_len)
            ids = np.asarray(gen(params, {k: jnp.asarray(v) for k, v in
                                          arrays.items()},
                                 jax.random.PRNGKey(int(rng.integers(2**31)))))
            texts = self.decode_words(tokenizer, ids)
            ces = None
            if score is not None:
                # Self-score the whole decoded batch in one call: the walk
                # arrays + the re-encoded captions follow the training-batch
                # contract ([BOS] w... [EOS] [PAD]..., attach_words).
                score_batch = {k: jnp.asarray(arrays[k]) for k in
                               ("cur_row", "view", "teacher", "active")}
                score_batch["words"] = jnp.asarray(
                    self.words_batch(tokenizer, texts))
                ces = np.asarray(score(params, score_batch))
            before = len(records)
            for i, text in enumerate(texts):
                if len(records) >= target:
                    break
                if not text:
                    continue
                # Recover the visited path from the teacher arrays.
                rows = [int(arrays["cur_row"][i, 0])]
                for t in range(1, self.episode_len):
                    if not arrays["active"][i, t]:
                        break
                    r = int(arrays["cur_row"][i, t])
                    if r != rows[-1]:
                        rows.append(r)
                path = [rt.row_to_id(r)[1] for r in rows]
                rec = {
                    "scan": walks["scans"][i],
                    "path": path,
                    "heading": walks["headings"][i],
                    "path_id": f"{prefix}_{len(records)}",
                    "instructions": [text],
                }
                if ces is not None:
                    rec["speaker_ce"] = float(ces[i])
                if target_vocab is not None:
                    rec["target"] = str(rng.choice(target_vocab))
                records.append(rec)
            empty_rounds = empty_rounds + 1 if len(records) == before else 0
        if keep_fraction is not None:
            records = sorted(records, key=lambda r: r["speaker_ce"])[:n]
            for k, rec in enumerate(records):
                rec["path_id"] = f"{prefix}_{k}"
        return records


def write_aug_records(records: list[dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(records, f)


def build_aug_instances(path: str, tokenizer, max_seq_length: int = 512,
                        oscar_setting: bool = False,
                        tar_back: bool = False) -> list:
    """Load speaker-generated R2R-format records as NavInstances (appended to
    the fine-tuning instance list via --aug_data).

    Records carrying a ``target`` field (``augment(target_vocab=...)`` /
    ``--aug_targets``) get the NDH sequence format — [TAR] target span plus
    the caption as a dialog turn — so aug and real instances are
    format-matched; target-less records keep the bare R2R format (which is
    also what real R2R instances use, datasets.py:162-171)."""
    from visitron_tpu.data.datasets import NavInstance
    from visitron_tpu.data.dialog import MAX_TARGET_LENGTH, build_dialog_sequence

    with open(path) as f:
        records = json.load(f)
    out = []
    for item in records:
        tgt = item.get("target")
        target_tokens = tokenizer.tokenize(tgt)[:MAX_TARGET_LENGTH] if tgt else None
        for j, instr in enumerate(item["instructions"]):
            seq = build_dialog_sequence(
                tokenizer, [tokenizer.tokenize(instr)],
                target_tokens=target_tokens,
                oscar_setting=oscar_setting, tar_back=tar_back,
                max_seq_length=max_seq_length)
            p = list(item["path"])
            out.append(NavInstance(
                inst_idx=f"{item['path_id']}_{j}",
                scan=item["scan"],
                token_ids=seq.token_ids,
                segment_ids=seq.segment_ids,
                length=seq.length,
                start_pano={"heading": item["heading"], "elevation": 0,
                            "pano": p[0]},
                planner_path=p, player_path=p, trusted_path=p,
                end_panos=[p[-1]], raw=item))
    return out
