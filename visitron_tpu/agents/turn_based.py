"""Turn-based (low-level action space) navigation agent.

Reference: tasks/turn_based/agent.py:68-477.  Six output actions (left,
right, up, down, forward, <end>); input embedding over 8 ids (+<start>,
<ignore>); single-view 2048-d features; forward always moves to the
most-centered visible neighbor (env_actions[4] == (1,0,0)).

Same TPU architecture as the viewpoint agent: teacher-forced episodes are
precomputed as int arrays (NavRuntime.turn_based_rollout_arrays) and the whole
rollout+loss runs in one jitted lax.scan; student rollouts move only (B,)
action ids across the host boundary.
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
from visitron_tpu.agents.viewpoint import ViewpointAgent
from visitron_tpu.models import BertConfig, OscarEncoder, TurnBasedDecoderLSTM
from visitron_tpu.ops.masking import NEG_INF
from visitron_tpu.train.optim import agent_optimizer

MODEL_ACTIONS = ["left", "right", "up", "down", "forward", "<end>", "<start>", "<ignore>"]
START_ID = MODEL_ACTIONS.index("<start>")
END_ID = MODEL_ACTIONS.index("<end>")
FORWARD_ID = MODEL_ACTIONS.index("forward")


@dataclass
class TurnBasedAgent:
    cfg: BertConfig
    runtime: NavRuntime
    feature_dim: int
    episode_len: int = 40
    aemb: int = 32
    rnn_dim: int = 512
    encoder_hidden_size: int = 512
    dropout: float = 0.5
    learning_rate: float = 1e-4
    optimizer_kind: str = "adam"
    max_grad_norm: float = 40.0
    bf16_adam_moments: bool = False
    seed: int = 88
    max_seq_length: int = 512
    mesh: object = None  # optional jax Mesh for data-parallel training

    def __post_init__(self):
        from visitron_tpu.models import config_for_mesh

        self.cfg = config_for_mesh(self.cfg, self.mesh)
        self.encoder = OscarEncoder(
            self.cfg, hidden_size=self.encoder_hidden_size,
            decoder_hidden_size=self.rnn_dim, dropout_ratio=self.dropout)
        # Mesh-free twin for host-local eval/rollout jits (same params;
        # see ViewpointAgent.eval_encoder for the incompatible-devices
        # rationale under jax.distributed).
        if self.cfg.attention_mesh is not None:
            self.eval_encoder = OscarEncoder(
                self.cfg.replace(attention_mesh=None),
                hidden_size=self.encoder_hidden_size,
                decoder_hidden_size=self.rnn_dim, dropout_ratio=self.dropout)
        else:
            self.eval_encoder = self.encoder
        self.decoder = TurnBasedDecoderLSTM(
            input_action_size=len(MODEL_ACTIONS), output_action_size=6,
            embedding_size=self.aemb, hidden_size=self.rnn_dim,
            dropout_ratio=self.dropout, feature_size=self.feature_dim)
        self.optimizer = agent_optimizer(
            self.learning_rate, self.optimizer_kind, self.max_grad_norm,
            bf16_moments=self.bf16_adam_moments)
        self._train_step = None
        self._rt_placed = None
        self._encode = {}
        self._student_step = {}
        self.results: dict = {}

    def init_state(self) -> dict:
        s = self.max_seq_length

        @jax.jit
        def init(rng):
            r1, r2 = jax.random.split(rng)
            enc_params = self.encoder.init(r1, jnp.ones((1, s), jnp.int32), jnp.array([s]))
            dec_params = self.decoder.init(
                r2, jnp.zeros((1,), jnp.int32), jnp.zeros((1, self.feature_dim)),
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
        if jax.process_count() == 1:  # see ViewpointAgent._place_batch
            batch = ViewpointAgent.trim_batch(batch)
        if self.mesh is not None:
            from visitron_tpu.parallel import shard_batch

            batch = shard_batch(self.mesh, batch)
        return batch

    def _episode_loss(self, rt, params, batch, rng, deterministic,
                      encoder=None):
        encoder = self.encoder if encoder is None else encoder
        ids, segs, lengths = batch["ids"], batch["segs"], batch["lengths"]
        rng, enc_rng = jax.random.split(rng)
        ctx, h_t, c_t = encoder.apply(
            params["encoder"], ids, lengths, token_type_ids=segs,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": enc_rng})
        t_len = batch["cur_row"].shape[1]
        ctx_mask = jnp.arange(ids.shape[1])[None, :] >= lengths[:, None]
        step_rngs = jax.random.split(rng, t_len)
        b = ids.shape[0]
        a0 = jnp.full((b,), START_ID, jnp.int32)

        def step(carry, xs):
            h, c, a_prev = carry
            cur_row, view, teacher, fwd_ok, active, step_rng = xs
            f_t = rt.feats[cur_row, view]  # (B, D) single view
            h_new, c_new, _, logit = self.decoder.apply(
                params["decoder"], a_prev, f_t, h, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": step_rng})
            # Mask forward when nothing is navigable (turn_based/agent.py:316-318).
            logit = jnp.where(
                (jnp.arange(6)[None, :] == FORWARD_ID) & ~fwd_ok[:, None],
                NEG_INF, logit)
            safe = jnp.where(active > 0, teacher, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logit.astype(jnp.float32), safe)
            n = jnp.maximum(jnp.sum(active), 1)
            step_loss = jnp.sum(ce * active) / n
            # Next-step input: the teacher action, or <ignore> once ended
            # (reference feeds the ignore id, turn_based/agent.py:212-232).
            a_next = jnp.where(active > 0, teacher,
                               MODEL_ACTIONS.index("<ignore>")).astype(jnp.int32)
            return (h_new, c_new, a_next), step_loss  # teacher forcing

        xs = (batch["cur_row"].T, batch["view"].T, batch["teacher"].T,
              batch["fwd_ok"].T, batch["active"].T.astype(jnp.float32), step_rngs)
        (_, _, _), step_losses = jax.lax.scan(step, (h_t, c_t, a0), xs)
        return jnp.sum(step_losses) / t_len

    def train_step_fn(self):
        if self._train_step is None:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, batch, rt):
                rng, step_rng = jax.random.split(state["rng"])
                loss, grads = jax.value_and_grad(
                    lambda p: self._episode_loss(rt, p, batch, step_rng, False)
                )(state["params"])
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

    def eval_loss_fn(self, use_dropout: bool = False):
        @jax.jit
        def eval_loss(params, batch, rng, rt):
            return self._episode_loss(rt, params, batch, rng, not use_dropout,
                                      encoder=self.eval_encoder)

        def run(params, batch, rng):
            return eval_loss(params, ViewpointAgent.trim_batch(batch), rng,
                             self.runtime)

        return run

    # -- student rollout ---------------------------------------------------
    def _student_step_fn(self, feedback: str, deterministic: bool):
        key = (feedback, deterministic)
        if key not in self._student_step:
            @jax.jit
            def step(rt, dec_params, h, c, a_prev, ctx, ctx_mask, cur_row,
                     view, fwd_ok, rng):
                f_t = rt.feats[cur_row, view]
                dropout_rng, sample_rng = jax.random.split(rng)
                h_new, c_new, _, logit = self.decoder.apply(
                    dec_params, a_prev, f_t, h, c, ctx, ctx_mask,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": dropout_rng})
                logit = jnp.where(
                    (jnp.arange(6)[None, :] == FORWARD_ID) & ~fwd_ok[:, None],
                    NEG_INF, logit)
                if feedback == "argmax":
                    a = jnp.argmax(logit, axis=-1)
                else:
                    a = jax.random.categorical(sample_rng, logit.astype(jnp.float32))
                return a.astype(jnp.int32), h_new, c_new

            self._student_step[key] = step
        return self._student_step[key]

    def rollout_student(self, params, batch, feedback: str = "argmax",
                        use_dropout: bool = False, rng=None):
        rt = self.runtime
        if rng is None:
            rng = jax.random.PRNGKey(0)
        batch = ViewpointAgent.trim_batch(batch)
        det = not use_dropout

        @jax.jit
        def encode(enc_params, ids, segs, lengths, enc_rng):
            return self.eval_encoder.apply(
                enc_params, ids, lengths, token_type_ids=segs,
                deterministic=det, rngs=None if det else {"dropout": enc_rng})

        rng, enc_rng = jax.random.split(rng)
        ctx, h, c = encode(params["encoder"], jnp.asarray(batch["ids"]),
                           jnp.asarray(batch["segs"]), jnp.asarray(batch["lengths"]), enc_rng)
        ctx_mask = jnp.asarray(
            np.arange(batch["ids"].shape[1])[None, :] >= batch["lengths"][:, None])
        step_fn = self._student_step_fn(feedback, det)
        b = len(batch["scans"])
        rows = np.asarray(batch["start_rows"], np.int32).copy()
        views = np.asarray(batch["start_views"], np.int32).copy()
        ended = np.zeros(b, bool)
        a_prev = np.full((b,), START_ID, np.int32)
        traj = []
        for i in range(b):
            scan, vp = rt.row_to_id(int(rows[i]))
            traj.append({"inst_idx": batch["inst_idx"][i],
                         "path": [(vp, geo.heading_of_view(int(views[i])),
                                   geo.elevation_of_view(int(views[i])))]})
        for _ in range(self.episode_len):
            fwd_ok = np.array([len(rt.navigable_at(int(rows[i]), int(views[i]))) > 0
                               for i in range(b)])
            rng, step_rng = jax.random.split(rng)
            a, h, c = step_fn(rt, params["decoder"], h, c, jnp.asarray(a_prev),
                              ctx, ctx_mask, jnp.asarray(rows),
                              jnp.asarray(views), jnp.asarray(fwd_ok), step_rng)
            a = np.asarray(a)
            for i in range(b):
                if ended[i]:
                    continue
                if a[i] == END_ID:
                    ended[i] = True
                    continue
                rows[i], views[i] = rt.apply_turn_action(int(rows[i]), int(views[i]), int(a[i]))
                scan, vp = rt.row_to_id(int(rows[i]))
                traj[i]["path"].append((vp, geo.heading_of_view(int(views[i])),
                                        geo.elevation_of_view(int(views[i]))))
            a_prev = a
            if ended.all():
                break
        return traj

    def test(self, params, batches, feedback: str = "argmax", rng=None) -> dict:
        self.results = {}
        looped = False
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        for batch in batches:
            rng, r = jax.random.split(rng)
            for traj in self.rollout_student(params, batch, feedback=feedback, rng=r):
                if traj["inst_idx"] in self.results:
                    looped = True
                else:
                    self.results[traj["inst_idx"]] = traj["path"]
            if looped:
                break
        return self.results
