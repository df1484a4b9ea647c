"""Question-asking classifier agent.

Reference: tasks/viewpoint_select/classifier/agent.py:76-717.  Navigation is
teacher-forced toward the player goal with the dialog encoder *frozen*
(no_grad); the decoder (AttnDecoderLSTMwithClassifier) emits a per-step
question-asking logit trained with pos-weighted BCE; the dialog context is
re-encoded from the timestep's snapshot whenever the episode reaches a
question-asking timestep (:429-462); targets are "will a question be asked at
t+1" with ignores once ended or past the episode's recorded gameplay
(:356-373); loss is per-step masked mean, summed / episode_len.

TPU architecture: because the encoder is frozen, all (few) dialog snapshots an
episode can use are encoded up front into a stacked context (E, B, S, H);
the teacher-forced rollout then runs as one jitted ``lax.scan`` that selects
the right context index per step.  Optionally everything except the question
head is frozen (--only_finetune_classifier, classifier/agent.py:141-147) via
an optax gradient mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visitron_tpu import geometry as geo
from visitron_tpu.agents.runtime import NavRuntime
from visitron_tpu.agents.viewpoint import gather_step_inputs
from visitron_tpu.data.classifier_dataset import ClassifierInstance
from visitron_tpu.models import AttnDecoderLSTMwithClassifier, BertConfig, OscarEncoder
from visitron_tpu.ops.masking import NEG_INF
from visitron_tpu.train.optim import agent_optimizer


def bce_with_logits(logits, targets, pos_weight: float):
    """Elementwise pos-weighted binary cross entropy on logits
    (torch BCEWithLogitsLoss(pos_weight=...) parity)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


@dataclass
class ClassifierAgent:
    cfg: BertConfig
    runtime: NavRuntime
    feature_dim: int
    episode_len: int = 40
    angle_feat_size: int = 4
    aemb: int = 64
    rnn_dim: int = 512
    encoder_hidden_size: int = 512
    dropout: float = 0.5
    learning_rate: float = 5e-5
    pos_weight: float = 5.0
    only_finetune_classifier: bool = True
    bf16_adam_moments: bool = False
    max_encode_events: int = 8
    seed: int = 88
    max_seq_length: int = 512
    mesh: object = None  # optional jax Mesh for data-parallel training

    def __post_init__(self):
        from visitron_tpu.models import config_for_mesh

        self.cfg = config_for_mesh(self.cfg, self.mesh)
        self.encoder = OscarEncoder(
            self.cfg, hidden_size=self.encoder_hidden_size,
            decoder_hidden_size=self.rnn_dim, dropout_ratio=self.dropout)
        # Mesh-free twin for host-local eval jits (same params; see
        # ViewpointAgent.eval_encoder for the incompatible-devices
        # rationale under jax.distributed).
        if self.cfg.attention_mesh is not None:
            self.eval_encoder = OscarEncoder(
                self.cfg.replace(attention_mesh=None),
                hidden_size=self.encoder_hidden_size,
                decoder_hidden_size=self.rnn_dim, dropout_ratio=self.dropout)
        else:
            self.eval_encoder = self.encoder
        self.decoder = AttnDecoderLSTMwithClassifier(
            angle_feat_size=self.angle_feat_size, embedding_size=self.aemb,
            hidden_size=self.rnn_dim, dropout_ratio=self.dropout,
            feature_size=self.feature_dim + self.angle_feat_size)
        base = agent_optimizer(self.learning_rate, "adam", 40.0,
                               bf16_moments=self.bf16_adam_moments)
        if self.only_finetune_classifier:
            def label_fn(params):
                def rule(path, _):
                    trainable = any("question_linear" in str(p) for p in path)
                    return "train" if trainable else "freeze"
                return jax.tree_util.tree_map_with_path(rule, params)
            self.optimizer = optax.multi_transform(
                {"train": base, "freeze": optax.set_to_zero()}, label_fn)
        else:
            self.optimizer = base
        self._train_step = None
        self._rt_placed = None

    def init_state(self) -> dict:
        s = self.max_seq_length
        d = self.feature_dim + self.angle_feat_size
        k1 = self.runtime.max_candidates + 1

        @jax.jit
        def init(rng):
            r1, r2 = jax.random.split(rng)
            enc_params = self.encoder.init(r1, jnp.ones((1, s), jnp.int32), jnp.array([s]))
            dec_params = self.decoder.init(
                r2, jnp.zeros((1, self.angle_feat_size)),
                jnp.zeros((1, geo.NUM_VIEWS, d)), jnp.zeros((1, k1, d)),
                jnp.zeros((1, self.rnn_dim)), jnp.zeros((1, self.rnn_dim)),
                jnp.zeros((1, s, self.encoder_hidden_size)))
            return {"encoder": enc_params, "decoder": dec_params}

        params = init(jax.random.PRNGKey(self.seed))
        state = {
            "params": params,
            "opt_state": jax.jit(self.optimizer.init)(params),
            "rng": jax.random.PRNGKey(self.seed + 1),
        }
        if self.mesh is not None:
            from visitron_tpu.parallel import replicate_state

            state = replicate_state(self.mesh, state)
        return state

    def _place_batch(self, batch: dict) -> dict:
        """Shard the batch over dp.  The classifier batch is heterogeneous:
        nav/qa arrays are batch-leading, the stacked language snapshots are
        (E, B, S) with batch second, and step2event is per-step (replicated)."""
        if self.mesh is None:
            return batch
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = {"lang_ids": 1, "lang_segs": 1, "lang_lens": 1, "step2event": None}

        def place(k, v):
            ax = axis.get(k, 0)
            spec = P() if ax is None else P(*([None] * ax + ["dp"]))
            return _jax.device_put(v, NamedSharding(self.mesh, spec))

        return {k: (place(k, v) if not isinstance(v, list) else v)
                for k, v in batch.items()}

    def load_nav_decoder(self, params: dict, nav_decoder_params: dict) -> dict:
        """Initialize from a fine-tuned nav checkpoint; the question head keeps
        its fresh init (missing-layer backfill parity, classifier/agent.py:699-711)."""
        import flax

        flat = flax.traverse_util.flatten_dict(nav_decoder_params["params"])
        tgt = flax.traverse_util.flatten_dict(params["decoder"]["params"])
        for k, v in flat.items():
            if k in tgt:
                tgt[k] = v
        merged = flax.traverse_util.unflatten_dict(tgt)
        out = dict(params)
        out["decoder"] = {"params": merged}
        return out

    # -- batch preparation (host) -------------------------------------------
    def prepare_batch(self, items: list[ClassifierInstance]) -> dict:
        rt = self.runtime
        b = len(items)
        t_len = self.episode_len
        starts = np.zeros(b, np.int32)
        views = np.zeros(b, np.int32)
        goals = np.zeros(b, np.int32)
        for i, it in enumerate(items):
            # Elevation always starts at 0 (reference newEpisodes parity).
            starts[i], views[i] = rt.start_state(
                it.scan, it.player_path[0], it.start_pano["heading"], 0.0)
            goals[i] = rt.row(it.scan, it.player_path[-1])
        scans = [it.scan for it in items]
        nav = rt.teacher_rollout_arrays(scans, starts, views, goals, t_len)

        # QA targets/ignores per step (classifier/agent.py:356-373).
        qa_target = np.zeros((b, t_len), np.float32)
        qa_ignore = np.ones((b, t_len), bool)
        ended = ~nav["active"]
        for i, it in enumerate(items):
            for t in range(t_len):
                if ended[i, t] or (t + 1) > it.max_timestep:
                    continue
                qa_ignore[i, t] = False
                qa_target[i, t] = 1.0 if (t + 1) in it.request_locations else 0.0

        # Encode events: step 0 plus every step t where some item has t in
        # request_locations (whole batch re-encoded; classifier/agent.py:424-462).
        events = [0]
        for t in range(1, t_len):
            if any(t in it.request_locations for it in items):
                events.append(t)
        s = items[0].token_ids.shape[1]
        # Every event is kept (the reference re-encodes at every request
        # timestep); e_max rounds up to a multiple of max_encode_events so
        # only a bounded number of jit shape variants exist.
        unit = max(self.max_encode_events, 1)
        e_max = -(-len(events) // unit) * unit
        lang_ids = np.zeros((e_max, b, s), np.int32)
        lang_segs = np.zeros((e_max, b, s), np.int32)
        lang_lens = np.ones((e_max, b), np.int32)
        step2event = np.zeros(t_len, np.int32)
        for ei, t in enumerate(events):
            for i, it in enumerate(items):
                row = it.language_at(t)
                lang_ids[ei, i] = it.token_ids[row]
                lang_segs[ei, i] = it.segment_ids[row]
                lang_lens[ei, i] = it.lengths[row]
        for ei in range(len(events), e_max):  # pad by repeating the last event
            lang_ids[ei] = lang_ids[len(events) - 1]
            lang_segs[ei] = lang_segs[len(events) - 1]
            lang_lens[ei] = lang_lens[len(events) - 1]
        cur = 0
        for t in range(t_len):
            if cur + 1 < len(events) and events[cur + 1] <= t:
                cur += 1
            step2event[t] = cur
        # Length-bucket the snapshots (128-multiples) — masking invariance
        # makes this exact while skipping all-pad encoder work.
        max_len = int(lang_lens.max())
        s_trim = min(s, -(-max_len // 128) * 128)
        lang_ids = lang_ids[:, :, :s_trim]
        lang_segs = lang_segs[:, :, :s_trim]
        return {
            "cur_row": nav["cur_row"], "view": nav["view"],
            "teacher": nav["teacher"], "active": nav["active"],
            "qa_target": qa_target, "qa_ignore": qa_ignore,
            "lang_ids": lang_ids, "lang_segs": lang_segs, "lang_lens": lang_lens,
            "step2event": step2event,
            "inst_idx": [it.inst_idx for it in items],
        }

    # -- jitted loss -----------------------------------------------------------
    def _episode_outputs(self, rt, params, batch, rng, deterministic,
                         encoder=None):
        encoder = self.encoder if encoder is None else encoder
        e, b, s = batch["lang_ids"].shape

        def enc_one(ids, segs, lens):
            ctx, h, c = encoder.apply(
                params["encoder"], ids, lens, token_type_ids=segs,
                deterministic=True)  # encoder frozen + eval mode (no_grad parity)
            return jax.lax.stop_gradient((ctx, h, c))

        ctxs, hs, cs = jax.vmap(enc_one)(
            batch["lang_ids"], batch["lang_segs"], batch["lang_lens"])
        ctx_masks = jnp.arange(s)[None, None, :] >= batch["lang_lens"][:, :, None]
        t_len = batch["cur_row"].shape[1]
        step_rngs = jax.random.split(rng, t_len)

        def step(carry, xs):
            h, c, prev_event = carry
            cur_row, view, active, event_idx, step_rng = xs
            # On re-encode steps the decoder state is re-seeded from the new
            # encoding (classifier/agent.py:446-457).
            switched = event_idx != prev_event
            h = jnp.where(switched, hs[event_idx], h)
            c = jnp.where(switched, cs[event_idx], c)
            ctx = ctxs[event_idx]
            ctx_mask = ctx_masks[event_idx]
            a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
            h_new, c_new, nav_logit, qa_logit, h_tilde = self.decoder.apply(
                params["decoder"], a_t, f_t, cand_feat, h, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": step_rng})
            return (h_new, c_new, event_idx), qa_logit[:, 0]

        xs = (batch["cur_row"].T, batch["view"].T,
              batch["active"].T.astype(jnp.float32),
              batch["step2event"], step_rngs)
        init = (hs[0], cs[0], jnp.zeros((), jnp.int32))
        (_, _, _), qa_logits = jax.lax.scan(step, init, xs)
        return qa_logits.T  # (B, T)

    def loss_fn(self, rt, params, batch, rng, deterministic=True,
                encoder=None):
        # Per-step masked mean, then / episode_len (classifier/agent.py:493-507,585).
        qa_logits = self._episode_outputs(rt, params, batch, rng, deterministic,
                                          encoder=encoder)  # (B, T)
        keep = (~batch["qa_ignore"]).astype(jnp.float32)
        per = bce_with_logits(qa_logits, batch["qa_target"], self.pos_weight) * keep
        n = jnp.maximum(keep.sum(axis=0), 1.0)  # per-step non-ignored count
        step_losses = per.sum(axis=0) / n
        t_len = qa_logits.shape[1]
        return jnp.sum(step_losses) / t_len, qa_logits

    def train_step_fn(self):
        if self._train_step is None:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, batch, rt):
                rng, step_rng = jax.random.split(state["rng"])
                (loss, _), grads = jax.value_and_grad(
                    lambda p: self.loss_fn(rt, p, batch, step_rng,
                                           deterministic=False),
                    has_aux=True)(state["params"])
                updates, opt_state = self.optimizer.update(
                    grads, state["opt_state"], state["params"])
                params = optax.apply_updates(state["params"], updates)
                return {"params": params, "opt_state": opt_state, "rng": rng}, loss

            def run(state, batch):
                return train_step(state, self._place_batch(batch),
                                  self.step_runtime())

            self._train_step = run
            self._train_step_jit = train_step
        return self._train_step

    def train_step_jit(self):
        """Raw jitted train step ``(state, batch, rt)`` (no host placement) —
        for AOT lowering and on-device-loop benchmarking (ViewpointAgent
        contract)."""
        self.train_step_fn()
        return self._train_step_jit

    def step_runtime(self):
        """Runtime tables for the (possibly mesh-sharded) train step —
        same contract as ViewpointAgent.step_runtime."""
        from visitron_tpu.agents.runtime import cached_step_runtime

        return cached_step_runtime(self)

    def evaluate(self, params, batches) -> dict[str, float]:
        """Deterministic pass collecting predictions/labels -> metrics
        (classifier/agent.py:596-603)."""
        from visitron_tpu.evaluation import binary_classification_metrics

        @jax.jit
        def fwd(params, batch, rt):
            return self.loss_fn(rt, params, batch, jax.random.PRNGKey(0), True,
                                encoder=self.eval_encoder)

        preds, labels = [], []
        total_loss, n = 0.0, 0
        for batch in batches:
            jb = {k: (np.asarray(v) if not isinstance(v, list) else v)
                  for k, v in batch.items()}
            loss, qa_logits = fwd(params, {k: v for k, v in jb.items()
                                           if not isinstance(v, list)},
                                  self.runtime)
            total_loss += float(loss)
            n += 1
            probs = jax.nn.sigmoid(qa_logits)
            keep = ~batch["qa_ignore"]
            preds.extend((np.asarray(probs)[keep] >= 0.5).astype(int).tolist())
            labels.extend(np.asarray(batch["qa_target"])[keep].astype(int).tolist())
        metrics = binary_classification_metrics(labels, preds)
        metrics["loss"] = total_loss / max(n, 1)
        return metrics
