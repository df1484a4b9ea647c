"""Viewpoint-selection navigation agent (the NDH fine-tuning workload).

Reference: tasks/viewpoint_select/agent.py:66-564.  The rollout engine is
re-architected for TPU:

  * Teacher forcing (the training path): the teacher trajectory is pure graph
    math, precomputed on host as (B, T) int32 arrays (NavRuntime); the entire
    episode — encoder, T decoder steps, per-step masked CE — runs in ONE
    jitted function with a ``lax.scan`` over time, full BPTT (the reference's
    ``detach_loss`` TBPTT hack, agent.py:447-472, is unnecessary: no
    per-step host sync means no activation-memory blowup from python graphs).
  * Student forcing (argmax/sample, used by val/test): encode once on device;
    a jitted single-step function returns only the chosen action ids; the
    host advances viewpoint/view indices with O(B) table lookups (no
    simulator, no feature transfer).
  * Candidate masking (agent.py:394-403), end handling (:429-445), the
    ended-loss ignore (:230-251), and loss normalization by episode length
    (:469-472) are preserved exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visitron_tpu import geometry as geo
from visitron_tpu.agents.decoding import select_action
from visitron_tpu.agents.runtime import NavRuntime
from visitron_tpu.models import AttnDecoderLSTM, BertConfig, OscarEncoder
from visitron_tpu.ops.masking import NEG_INF
from visitron_tpu.train.optim import agent_optimizer

IGNORE_ID = -100


def gather_step_inputs(rt: NavRuntime, cur_row, view, feats=None):
    """Device-side assembly of one step's decoder inputs from packed tables.

    cur_row, view: (B,) int32.  Returns (a_t (B,4), f_t (B,36,D+4),
    cand_feat (B,K+1,D+4), cand_mask (B,K+1) True at invalid slots).
    """
    feats = rt.feats if feats is None else feats
    pano = feats[cur_row]  # (B, 36, D)
    f_t = jnp.concatenate([pano, rt.pano_af[view]], axis=-1)
    a_t = rt.view_af[view]  # (B, 4) camera angle feature
    pts = rt.point[cur_row]  # (B, K)
    cand_vis = jnp.take_along_axis(pano, pts[:, :, None], axis=1)  # (B, K, D)
    base_heading = (view % geo.HEADINGS_PER_ROW).astype(f_t.dtype) * geo.ANGLE_INC
    ch = rt.heading[cur_row] - base_heading[:, None]
    ce = rt.elev[cur_row]
    cand_af = jnp.stack([jnp.sin(ch), jnp.cos(ch), jnp.sin(ce), jnp.cos(ce)], axis=-1)
    cand = jnp.concatenate([cand_vis, cand_af.astype(f_t.dtype)], axis=-1)
    # Stop slot (zero feature) appended; slots beyond count+stop are masked
    # (agent.py:202-217, utils.py:340-347).
    stop = jnp.zeros((cand.shape[0], 1, cand.shape[2]), cand.dtype)
    cand_feat = jnp.concatenate([cand, stop], axis=1)  # (B, K+1, D+4)
    k1 = cand_feat.shape[1]
    counts = rt.count[cur_row]
    cand_mask = jnp.arange(k1)[None, :] > counts[:, None]
    return a_t, f_t, cand_feat, cand_mask


@dataclass
class ViewpointAgent:
    cfg: BertConfig
    runtime: NavRuntime
    feature_dim: int  # scene feature dim D (without angle feat)
    episode_len: int = 10
    angle_feat_size: int = 4
    aemb: int = 64
    rnn_dim: int = 512
    encoder_hidden_size: int = 512
    dropout: float = 0.5
    learning_rate: float = 5e-5
    optimizer_kind: str = "adam"
    max_grad_norm: float = 40.0
    bf16_adam_moments: bool = False  # store Adam mu/nu in bf16 (halves
                                     # optimizer-state HBM traffic)
    zero1: bool = False  # ZeRO-1: shard the optimizer state over the dp
                         # mesh axis (parallel/mesh.py:zero1_opt_rules);
                         # needs a mesh, params stay replicated
    seed: int = 88
    max_seq_length: int = 512
    temperature: float = 1.0  # temperature/penalty feedback scaling
    mesh: object = None  # optional jax Mesh for data-parallel training

    def __post_init__(self):
        from visitron_tpu.models import config_for_mesh

        self.cfg = config_for_mesh(self.cfg, self.mesh)
        self.encoder = OscarEncoder(
            self.cfg,
            hidden_size=self.encoder_hidden_size,
            decoder_hidden_size=self.rnn_dim,
            dropout_ratio=self.dropout,
        )
        # Eval/rollout twin: validation and trajectory rollouts are jitted
        # host-local (each host scores its own split with self.runtime, not
        # the mesh-placed tables), so their encoder must NOT carry
        # attention_mesh — a shard_map over the global mesh inside a
        # host-local jit is an incompatible-devices error under
        # jax.distributed.  Same params (attention routing is param-free).
        if self.cfg.attention_mesh is not None:
            self.eval_encoder = OscarEncoder(
                self.cfg.replace(attention_mesh=None),
                hidden_size=self.encoder_hidden_size,
                decoder_hidden_size=self.rnn_dim,
                dropout_ratio=self.dropout,
            )
        else:
            self.eval_encoder = self.encoder
        self.decoder = AttnDecoderLSTM(
            angle_feat_size=self.angle_feat_size,
            embedding_size=self.aemb,
            hidden_size=self.rnn_dim,
            dropout_ratio=self.dropout,
            feature_size=self.feature_dim + self.angle_feat_size,
        )
        self.optimizer = agent_optimizer(
            self.learning_rate, self.optimizer_kind, self.max_grad_norm,
            bf16_moments=self.bf16_adam_moments)
        from visitron_tpu.models import Critic

        self._critic = Critic(hidden_size=self.rnn_dim, dropout_ratio=self.dropout)
        self._train_step = None
        self._encode = {}
        self._student_step = {}
        self._rt_placed = None
        self.results: dict = {}

    # -- parameter init ------------------------------------------------------
    def init_state(self, with_critic: bool = False) -> dict:
        """``with_critic``: include the value head used by RL fine-tuning
        (models/speaker.py:Critic — present-but-unwired in the reference)."""
        rng = jax.random.PRNGKey(self.seed)
        s = self.max_seq_length
        d = self.feature_dim + self.angle_feat_size
        k1 = self.runtime.max_candidates + 1

        # Jitted init: one compiled program instead of thousands of eager ops
        # (critical on remote-attached TPUs where eager dispatch is a RPC).
        @jax.jit
        def init(rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            ids = jnp.ones((1, s), jnp.int32)
            lengths = jnp.array([s])
            enc_params = self.encoder.init(r1, ids, lengths)
            dec_params = self.decoder.init(
                r2,
                jnp.zeros((1, self.angle_feat_size)),
                jnp.zeros((1, geo.NUM_VIEWS, d)),
                jnp.zeros((1, k1, d)),
                jnp.zeros((1, self.rnn_dim)),
                jnp.zeros((1, self.rnn_dim)),
                jnp.zeros((1, s, self.encoder_hidden_size)),
            )
            out = {"encoder": enc_params, "decoder": dec_params}
            if with_critic:
                out["critic"] = self._critic.init(
                    r3, jnp.zeros((1, self.rnn_dim)))
            return out

        params = init(rng)
        state = {
            "params": params,
            "opt_state": jax.jit(self.optimizer.init)(params),
            "rng": jax.random.PRNGKey(self.seed + 1),
        }
        if self.mesh is not None:
            from visitron_tpu.parallel import replicated_sharding

            state = jax.device_put(state, replicated_sharding(self.mesh))
            if self.zero1:
                from visitron_tpu.parallel import zero1_shard_opt_state

                state["opt_state"] = zero1_shard_opt_state(
                    self.mesh, state["opt_state"])
        return state

    # -- shared pieces ---------------------------------------------------------
    def _pin_layouts(self, params, opt_state):
        """ZeRO-1 layout stability inside the jitted steps (rules derived
        from the traced trees, so the RL critic's extra opt subtree pins
        correctly alongside the plain nav one)."""
        if not (self.zero1 and self.mesh is not None):
            return params, opt_state
        from visitron_tpu.parallel import zero1_pin_layouts

        return zero1_pin_layouts(self.mesh, params, opt_state)

    @staticmethod
    def trim_batch(batch: dict, bucket: int = 128) -> dict:
        """Trim dialog arrays to the batch's max length rounded up to a
        ``bucket`` multiple.  Semantically identical (masking invariance:
        padded keys are masked, the LSTM freezes at pads — verified in
        tests) but skips the encoder/LSTM work the reference wastes on
        all-pad positions; at most S/bucket jit variants exist."""
        from visitron_tpu.agents.batcher import trim_to_bucket

        return trim_to_bucket(batch, int(batch["lengths"].max()), bucket)

    def _encode_fn(self, deterministic: bool):
        if deterministic not in self._encode:
            @jax.jit
            def encode(enc_params, ids, segs, lengths, rng):
                return self.eval_encoder.apply(
                    enc_params, ids, lengths, token_type_ids=segs,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": rng},
                )
            self._encode[deterministic] = encode
        return self._encode[deterministic]

    def _episode_loss(self, rt, params, batch, rng, deterministic,
                      encoder=None):
        """Encoder + scanned teacher-forced decode; returns mean loss.
        ``rt`` arrives as a pytree jit argument (never a closure: closure
        constants embed the world tables into every lowered program).
        ``encoder`` lets the host-local eval path substitute its mesh-free
        twin (eval_encoder); training uses the mesh-routed default."""
        encoder = self.encoder if encoder is None else encoder
        ids, segs, lengths = batch["ids"], batch["segs"], batch["lengths"]
        rng, enc_rng = jax.random.split(rng)
        ctx, h_t, c_t = encoder.apply(
            params["encoder"], ids, lengths, token_type_ids=segs,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": enc_rng},
        )
        t_len = batch["cur_row"].shape[1]
        ctx_mask = jnp.arange(ids.shape[1])[None, :] >= lengths[:, None]
        step_rngs = jax.random.split(rng, t_len)

        def step(carry, xs):
            h1, c = carry
            cur_row, view, teacher, active, step_rng = xs
            a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
            h_new, c_new, logit, h_tilde = self.decoder.apply(
                params["decoder"], a_t, f_t, cand_feat, h1, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": step_rng},
            )
            logit = jnp.where(cand_mask, NEG_INF, logit)
            safe = jnp.where(active, teacher, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logit.astype(jnp.float32), safe)
            # Per-step mean over non-ignored batch items (CrossEntropyLoss
            # ignore_index parity, agent.py:406-412).
            n = jnp.maximum(jnp.sum(active), 1)
            step_loss = jnp.sum(ce * active) / n
            return (h_tilde, c_new), step_loss

        xs = (
            batch["cur_row"].T, batch["view"].T, batch["teacher"].T,
            batch["active"].T.astype(jnp.float32), step_rngs,
        )
        (_, _), step_losses = jax.lax.scan(step, (h_t, c_t), xs)
        return jnp.sum(step_losses) / t_len  # agent.py:472

    def _sampled_episode_loss(self, rt, params, batch, rng, deterministic,
                              feedback: str = "sample"):
        """Student-forced (sample/argmax) episode, FULLY on device.

        The agent follows its own sampled actions while every step is
        supervised by the shortest-path teacher at the visited state
        (reference feedback='sample' training, agent.py:406-425).  The
        teacher comes from per-item next-hop columns (NavRuntime
        .sample_rollout_arrays), so the whole rollout — sampling, state
        transitions, supervision — runs inside one jitted lax.scan.
        """
        ids, segs, lengths = batch["ids"], batch["segs"], batch["lengths"]
        rng, enc_rng = jax.random.split(rng)
        ctx, h_t, c_t = self.encoder.apply(
            params["encoder"], ids, lengths, token_type_ids=segs,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": enc_rng},
        )
        ctx_mask = jnp.arange(ids.shape[1])[None, :] >= lengths[:, None]
        t_len = self.episode_len
        step_rngs = jax.random.split(rng, t_len)
        b = ids.shape[0]
        goal = jnp.asarray(batch["goal_rows"])
        teacher_col = jnp.asarray(batch["teacher_col"])  # (B, Vmax) global rows
        offset = jnp.asarray(batch["scan_offset"])  # (B,)
        b_idx = jnp.arange(b)

        k1 = rt.max_candidates + 1

        def step(carry, xs):
            h1, c, cur_row, view, ended, taken = carry
            step_rng, dropout_rng = jax.random.split(xs)
            a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
            h_new, c_new, logit, h_tilde = self.decoder.apply(
                params["decoder"], a_t, f_t, cand_feat, h1, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": dropout_rng},
            )
            logit = jnp.where(cand_mask, NEG_INF, logit)
            # On-device teacher: next-hop column lookup; stop slot at goal.
            counts = rt.count[cur_row]
            at_goal = cur_row == goal
            t_next = teacher_col[b_idx, cur_row - offset]
            match = rt.nbr[cur_row] == t_next[:, None]  # (B, K)
            slot = jnp.argmax(match, axis=-1)
            teacher = jnp.where(at_goal, counts, slot)
            active = (~ended).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logit.astype(jnp.float32), teacher)
            n = jnp.maximum(jnp.sum(active), 1.0)
            step_loss = jnp.sum(ce * active) / n
            # Student action: any extended decoding strategy
            # (next_decoder_input parity, utils.py:381-427).
            a = select_action(feedback, logit, step_rng, target=teacher,
                              temperature=self.temperature, taken_mask=taken)
            taken2 = taken | (jnp.arange(k1)[None, :] == a[:, None])
            stop = a >= counts
            new_ended = ended | stop
            move = (~ended) & (~stop)
            safe_a = jnp.minimum(a, rt.max_candidates - 1)
            nxt_row = rt.nbr[cur_row, safe_a]
            nxt_view = rt.point[cur_row, safe_a]
            cur_row2 = jnp.where(move, nxt_row, cur_row).astype(jnp.int32)
            view2 = jnp.where(move, nxt_view, view).astype(jnp.int32)
            return (h_tilde, c_new, cur_row2, view2, new_ended, taken2), step_loss

        init = (h_t, c_t, jnp.asarray(batch["start_rows"]),
                jnp.asarray(batch["start_views"]), jnp.zeros(b, bool),
                jnp.zeros((b, k1), bool))
        (_, _, final_row, _, _, _), step_losses = jax.lax.scan(step, init, step_rngs)
        return jnp.sum(step_losses) / t_len

    def step_runtime(self):
        """Runtime tables for the (possibly mesh-sharded) train step.

        The tables enter the jitted step as ARGUMENTS (see NavRuntime's
        pytree registration); on a mesh they must be globally replicated
        arrays — single-host via device_put, multi-host by assembling each
        host's identical copy into one global array."""
        from visitron_tpu.agents.runtime import cached_step_runtime

        return cached_step_runtime(self)

    def _place_batch(self, batch: dict) -> dict:
        """Length-bucket the batch and, when training on a mesh, shard it over
        the dp axis (params stay replicated; the SPMD partitioner inserts the
        gradient all-reduce — DDP + manual allreduce parity, agent.py:509-512)."""
        # Per-host length bucketing would desync global array shapes across
        # processes; only trim when single-host.
        if jax.process_count() == 1:
            batch = self.trim_batch(batch)
        if self.mesh is not None:
            from visitron_tpu.parallel import shard_batch

            batch = shard_batch(self.mesh, batch)
        return batch

    def _rl_episode_loss(self, rt, params, batch, rng, deterministic,
                         gamma: float = 0.9, ml_weight: float = 0.05,
                         entropy_weight: float = 0.01,
                         success_margin: float = 3.0,
                         success_bonus: float = 3.0):
        """Advantage actor-critic over a fully on-device sampled episode.

        Extension beyond the reference (its Critic ships unwired,
        agent_models.py:632-643): per-step reward = metric progress toward
        the goal (dist-to-goal gathers from NavRuntime columns) plus a
        +/- success bonus at the stop action; policy gradient with a critic
        baseline, entropy bonus, and an optional teacher-CE mixing term
        (EnvDrop-style ML+RL).  Everything — sampling, transitions, rewards,
        supervision — runs inside one jitted lax.scan.
        """
        ids, segs, lengths = batch["ids"], batch["segs"], batch["lengths"]
        rng, enc_rng = jax.random.split(rng)
        ctx, h_t, c_t = self.encoder.apply(
            params["encoder"], ids, lengths, token_type_ids=segs,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": enc_rng},
        )
        ctx_mask = jnp.arange(ids.shape[1])[None, :] >= lengths[:, None]
        t_len = self.episode_len
        step_rngs = jax.random.split(rng, t_len)
        b = ids.shape[0]
        goal = jnp.asarray(batch["goal_rows"])
        teacher_col = jnp.asarray(batch["teacher_col"])
        dist_col = jnp.asarray(batch["dist_col"])
        offset = jnp.asarray(batch["scan_offset"])
        b_idx = jnp.arange(b)

        def step(carry, xs):
            h1, c, cur_row, view, ended = carry
            step_rng, dropout_rng, critic_rng = jax.random.split(xs, 3)
            a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
            h_new, c_new, logit, h_tilde = self.decoder.apply(
                params["decoder"], a_t, f_t, cand_feat, h1, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": dropout_rng},
            )
            logit = jnp.where(cand_mask, NEG_INF, logit).astype(jnp.float32)
            counts = rt.count[cur_row]
            # Teacher slot for the ML mixing term (same math as the sampled loss).
            at_goal = cur_row == goal
            t_next = teacher_col[b_idx, cur_row - offset]
            slot = jnp.argmax(rt.nbr[cur_row] == t_next[:, None], axis=-1)
            teacher = jnp.where(at_goal, counts, slot)
            logp_all = jax.nn.log_softmax(logit, axis=-1)
            p_all = jnp.exp(logp_all)
            entropy = -jnp.sum(jnp.where(cand_mask, 0.0, p_all * logp_all), axis=-1)
            a = jax.random.categorical(step_rng, logit)
            logp = jnp.take_along_axis(logp_all, a[:, None], axis=-1)[:, 0]
            value = self._critic.apply(
                params["critic"], h_tilde.astype(jnp.float32),
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": critic_rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(logit, teacher)
            # Transition + reward.
            stop = a >= counts
            active = (~ended).astype(jnp.float32)
            move = (~ended) & (~stop)
            safe_a = jnp.minimum(a, rt.max_candidates - 1)
            nxt_row = rt.nbr[cur_row, safe_a]
            cur_row2 = jnp.where(move, nxt_row, cur_row).astype(jnp.int32)
            view2 = jnp.where(move, rt.point[cur_row, safe_a], view).astype(jnp.int32)
            d_cur = dist_col[b_idx, cur_row - offset]
            d_new = dist_col[b_idx, cur_row2 - offset]
            first_stop = (~ended) & stop
            reward = jnp.where(
                first_stop,
                jnp.where(d_cur < success_margin, success_bonus, -success_bonus),
                (d_cur - d_new)) * active
            new_ended = ended | stop
            return ((h_tilde, c_new, cur_row2, view2, new_ended),
                    (logp, value, reward, active, entropy, ce))

        init = (h_t, c_t, jnp.asarray(batch["start_rows"]),
                jnp.asarray(batch["start_views"]), jnp.zeros(b, bool))
        _, (logp, value, reward, active, entropy, ce) = jax.lax.scan(
            step, init, step_rngs)

        # Discounted returns: reverse scan R_t = r_t + gamma R_{t+1}.
        def disc(r_next, r_t):
            r = r_t + gamma * r_next
            return r, r

        _, returns = jax.lax.scan(disc, jnp.zeros(b), reward, reverse=True)
        n = jnp.maximum(active.sum(), 1.0)
        adv = jax.lax.stop_gradient(returns - value)
        policy_loss = -jnp.sum(logp * adv * active) / n
        critic_loss = jnp.sum((returns - value) ** 2 * active) / n
        ent = jnp.sum(entropy * active) / n
        ml = jnp.sum(ce * active) / n
        total = (policy_loss + 0.5 * critic_loss - entropy_weight * ent
                 + ml_weight * ml)
        aux = {"policy_loss": policy_loss, "critic_loss": critic_loss,
               "entropy": ent, "ml_loss": ml,
               "mean_return": jnp.sum(returns * active) / n}
        return total, aux

    def rl_train_step_fn(self, gamma: float = 0.9, ml_weight: float = 0.05,
                         entropy_weight: float = 0.01):
        """A2C train step (requires ``init_state(with_critic=True)``)."""
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rt):
            rng, step_rng = jax.random.split(state["rng"])

            def loss_fn(p):
                return self._rl_episode_loss(
                    rt, p, batch, step_rng, False, gamma=gamma,
                    ml_weight=ml_weight, entropy_weight=entropy_weight)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"])
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            params, opt_state = self._pin_layouts(params, opt_state)
            return {"params": params, "opt_state": opt_state, "rng": rng}, (loss, aux)

        def run(state, batch):
            return train_step(state, self._place_batch(batch),
                              self.step_runtime())

        return run

    def sample_train_step_fn(self, feedback: str = "sample"):
        """Train step for student-forced training (reference default
        --feedback_method sample; extended strategies topk/nucleus/
        temperature/penalty per utils.py:381-427)."""
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=())
        def train_step(state, batch, rt):
            rng, step_rng = jax.random.split(state["rng"])

            def loss_fn(p):
                return self._sampled_episode_loss(rt, p, batch, step_rng, False,
                                                  feedback)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            params, opt_state = self._pin_layouts(params, opt_state)
            return {"params": params, "opt_state": opt_state, "rng": rng}, loss

        def run(state, batch):
            return train_step(state, self._place_batch(batch),
                              self.step_runtime())

        return run

    def train_step_fn(self):
        if self._train_step is not None:
            return self._train_step

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rt):
            rng, step_rng = jax.random.split(state["rng"])

            def loss_fn(p):
                return self._episode_loss(rt, p, batch, step_rng,
                                          deterministic=False)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            params, opt_state = self._pin_layouts(params, opt_state)
            return {"params": params, "opt_state": opt_state, "rng": rng}, loss

        def run(state, batch):
            return train_step(state, self._place_batch(batch),
                              self.step_runtime())

        # Raw jit handle for cost analysis (bench.py lowers it for FLOPs/MFU).
        self._train_step_jit = train_step
        self._train_step = run
        return self._train_step

    def train_step_jit(self):
        """Public handle to the raw jitted teacher-forced train step (no
        host-side batch placement) — for AOT lowering/compilation (bench cost
        analysis, multihost compile-before-barrier)."""
        self.train_step_fn()
        return self._train_step_jit

    def eval_loss_fn(self, use_dropout: bool = False):
        """Validation loss with teacher forcing (test(use_dropout=True,
        feedback='teacher', allow_cheat=True) parity, train.py:318-320)."""
        @jax.jit
        def eval_loss(params, batch, rng, rt):
            return self._episode_loss(rt, params, batch, rng,
                                      deterministic=not use_dropout,
                                      encoder=self.eval_encoder)

        def run(params, batch, rng):
            return eval_loss(params, self.trim_batch(batch), rng, self.runtime)

        return run

    # -- student-forced rollout --------------------------------------------------
    def _student_step_fn(self, feedback: str, deterministic: bool):
        key = (feedback, deterministic)
        if key in self._student_step:
            return self._student_step[key]

        @jax.jit
        def step(rt, dec_params, h1, c, ctx, ctx_mask, cur_row, view,
                 visited_mask, taken_mask, rng):
            a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
            dropout_rng, sample_rng = jax.random.split(rng)
            h_new, c_new, logit, h_tilde = self.decoder.apply(
                dec_params, a_t, f_t, cand_feat, h1, c, ctx, ctx_mask,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": dropout_rng},
            )
            logit = jnp.where(cand_mask | visited_mask, NEG_INF, logit)
            a = select_action(feedback, logit, sample_rng,
                              temperature=self.temperature, taken_mask=taken_mask)
            return a.astype(jnp.int32), h_tilde, c_new, logit

        self._student_step[key] = step
        return step

    def _device_rollout_fn(self, feedback: str):
        """Fully on-device student rollout: encode + T decode/act steps in one
        jit; returns per-step (row, view, moved) arrays.  Used by the eval
        path when no visited-masking is needed (submit=False)."""
        key = ("device_rollout", feedback)
        if key in self._student_step:
            return self._student_step[key]

        @jax.jit
        def rollout(rt, params, ids, segs, lengths, start_rows, start_views, rng):
            ctx, h_t, c_t = self.eval_encoder.apply(
                params["encoder"], ids, lengths, token_type_ids=segs,
                deterministic=True)
            ctx_mask = jnp.arange(ids.shape[1])[None, :] >= lengths[:, None]
            b = ids.shape[0]
            step_rngs = jax.random.split(rng, self.episode_len)

            k1 = rt.max_candidates + 1

            def step(carry, step_rng):
                h1, c, cur_row, view, ended, taken = carry
                a_t, f_t, cand_feat, cand_mask = gather_step_inputs(rt, cur_row, view)
                h_new, c_new, logit, h_tilde = self.decoder.apply(
                    params["decoder"], a_t, f_t, cand_feat, h1, c, ctx, ctx_mask,
                    deterministic=True)
                logit = jnp.where(cand_mask, NEG_INF, logit)
                a = select_action(feedback, logit, step_rng,
                                  temperature=self.temperature, taken_mask=taken)
                taken2 = taken | (jnp.arange(k1)[None, :] == a[:, None])
                counts = rt.count[cur_row]
                stop = a >= counts
                moved = (~ended) & (~stop)
                safe_a = jnp.minimum(a, rt.max_candidates - 1)
                cur_row2 = jnp.where(moved, rt.nbr[cur_row, safe_a], cur_row).astype(jnp.int32)
                view2 = jnp.where(moved, rt.point[cur_row, safe_a], view).astype(jnp.int32)
                new_ended = ended | stop
                return (h_tilde, c_new, cur_row2, view2, new_ended, taken2), (cur_row2, view2, moved)

            init = (h_t, c_t, start_rows, start_views, jnp.zeros(b, bool),
                    jnp.zeros((b, k1), bool))
            _, (rows, views, moved) = jax.lax.scan(step, init, step_rngs)
            return rows.T, views.T, moved.T  # (B, T)

        self._student_step[key] = rollout
        return rollout

    def rollout_student_on_device(self, params, batch, feedback: str = "argmax",
                                  rng=None):
        """Trajectory rollout with ONE device dispatch per batch."""
        rt = self.runtime
        if rng is None:
            rng = jax.random.PRNGKey(0)
        batch = self.trim_batch(batch)
        rollout = self._device_rollout_fn(feedback)
        rows, views, moved = rollout(
            self.runtime, params, jnp.asarray(batch["ids"]), jnp.asarray(batch["segs"]),
            jnp.asarray(batch["lengths"]), jnp.asarray(batch["start_rows"]),
            jnp.asarray(batch["start_views"]), rng)
        rows, views, moved = np.asarray(rows), np.asarray(views), np.asarray(moved)
        traj = []
        for i in range(rows.shape[0]):
            scan, vp = rt.row_to_id(int(batch["start_rows"][i]))
            v0 = int(batch["start_views"][i])
            path = [(vp, geo.heading_of_view(v0), geo.elevation_of_view(v0))]
            for t in range(rows.shape[1]):
                if moved[i, t]:
                    scan, vp = rt.row_to_id(int(rows[i, t]))
                    path.append((vp, geo.heading_of_view(int(views[i, t])),
                                 geo.elevation_of_view(int(views[i, t]))))
            traj.append({"inst_idx": batch["inst_idx"][i], "path": path})
        return traj

    def rollout_student(self, params, batch, feedback: str = "argmax",
                        use_dropout: bool = False, rng=None, submit: bool = False):
        """Run a full student-forced episode; returns trajectories.

        batch: ids/segs/lengths (host arrays) + scans, start_rows, start_views,
        inst_idx.  Trajectory format parity: [(viewpointId, heading, elevation)]
        starting at the start pose (agent.py:358-365,429-445).
        """
        rt = self.runtime
        if rng is None:
            rng = jax.random.PRNGKey(0)
        batch = self.trim_batch(batch)
        encode = self._encode_fn(not use_dropout)
        rng, enc_rng = jax.random.split(rng)
        ctx, h_t, c_t = encode(params["encoder"], jnp.asarray(batch["ids"]),
                               jnp.asarray(batch["segs"]), jnp.asarray(batch["lengths"]),
                               enc_rng)
        ctx_mask = np.arange(batch["ids"].shape[1])[None, :] >= batch["lengths"][:, None]
        step_fn = self._student_step_fn(feedback, not use_dropout)

        b = len(batch["scans"])
        rows = np.asarray(batch["start_rows"], np.int32).copy()
        views = np.asarray(batch["start_views"], np.int32).copy()
        ended = np.zeros(b, bool)
        k1 = rt.max_candidates + 1
        visited_rows = [set([int(r)]) for r in rows]
        traj = []
        for i in range(b):
            scan, vp = rt.row_to_id(int(rows[i]))
            traj.append({
                "inst_idx": batch["inst_idx"][i],
                "path": [(vp, geo.heading_of_view(int(views[i])),
                          geo.elevation_of_view(int(views[i])))],
            })
        h1, c = h_t, c_t
        ctx_mask_j = jnp.asarray(ctx_mask)
        taken_mask = np.zeros((b, k1), bool)  # penalty-feedback history
        for _ in range(self.episode_len):
            visited_mask = np.zeros((b, k1), bool)
            if submit:  # avoid cyclic paths (agent.py:397-402)
                for i in range(b):
                    cand_rows = rt.nbr_h[rows[i]]
                    for slot in range(rt.max_candidates):
                        if cand_rows[slot] in visited_rows[i]:
                            visited_mask[i, slot] = True
            rng, step_rng = jax.random.split(rng)
            a, h1, c, _ = step_fn(
                self.runtime, params["decoder"], h1, c, ctx, ctx_mask_j,
                jnp.asarray(rows), jnp.asarray(views), jnp.asarray(visited_mask),
                jnp.asarray(taken_mask), step_rng)
            a = np.asarray(a)
            taken_mask[np.arange(b), np.minimum(a, k1 - 1)] = True
            for i in range(b):
                if ended[i]:
                    continue
                if a[i] >= rt.count_h[rows[i]]:  # stop slot
                    ended[i] = True
                    continue
                rows[i], views[i] = rt.step_to(int(rows[i]), int(a[i]))
                visited_rows[i].add(int(rows[i]))
                scan, vp = rt.row_to_id(int(rows[i]))
                traj[i]["path"].append(
                    (vp, geo.heading_of_view(int(views[i])),
                     geo.elevation_of_view(int(views[i]))))
            if ended.all():
                break
        return traj

    # -- test loop (loop-until-repeat parity, agent.py:49-63) ---------------------
    def test(self, params, batches, feedback: str = "argmax", rng=None,
             submit: bool = False) -> dict:
        self.results = {}
        looped = False
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        for batch in batches:
            rng, r = jax.random.split(rng)
            if submit:
                # Visited-mask bookkeeping needs the host in the loop.
                trajs = self.rollout_student(params, batch, feedback=feedback,
                                             rng=r, submit=True)
            else:
                trajs = self.rollout_student_on_device(params, batch,
                                                       feedback=feedback, rng=r)
            for traj in trajs:
                if traj["inst_idx"] in self.results:
                    looped = True
                else:
                    self.results[traj["inst_idx"]] = traj["path"]
            if looped:
                break
        return self.results

    def write_results(self, path: str) -> None:
        import json

        output = [{"inst_idx": k, "trajectory": v} for k, v in self.results.items()]
        with open(path, "w") as f:
            json.dump(output, f)
