"""Multimodal (Oscar-style) BERT in flax, with per-layer history-state support.

Re-designed from the reference stack (oscar/modeling_bert.py:26-169 +
tasks/viewpoint_select/encoder.py:161-303) for TPU:

  * single fused QKV projection per layer (one MXU matmul instead of three);
  * attention core routed through visitron_tpu.ops.attention (jnp/XLA-fused,
    Pallas flash kernel for long joint sequences on TPU);
  * bfloat16 activations with float32 parameters/softmax/layernorm;
  * ``history_state``: per-layer states prepended to K/V only
    (incremental-encoding mechanism, modeling_bert.py:37-41);
  * image-region fusion: Linear(img_dim->H) + Linear(128->H) location embeds,
    additive, dropped-out, concatenated after the text embeddings
    (encoder.py:276-287).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from visitron_tpu.ops.attention import (attention_supports_flash,
                                        attention_supports_flash_mesh,
                                        attention_supports_fused,
                                        attention_supports_fused_mesh,
                                        attention_supports_ring,
                                        flash_attention, flash_attention_mesh,
                                        fused_attention, fused_attention_mesh,
                                        fused_attention_mesh_packed,
                                        fused_attention_packed,
                                        multi_head_attention, ring_attention)
from visitron_tpu.ops.layernorm import (fused_add_layernorm,
                                        fused_add_layernorm_mesh,
                                        layernorm_supports,
                                        layernorm_supports_mesh)
from visitron_tpu.ops.masking import make_attention_bias


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # Multimodal extensions (model_utils.py:75-83):
    img_feature_dim: int = 2054
    location_embed_dim: int = 128
    use_img_layernorm: bool = False
    action_space: int = 36
    detector_classes: int = 1601
    dtype: Any = jnp.float32  # activation dtype (bfloat16 on TPU)
    # Route attention through the Pallas blockwise kernel set when the shape
    # tiles (TPU, lengths % 128, head_dim 64/128); training dropout is fused
    # into the kernels.  Otherwise the XLA-fused jnp path runs.
    use_flash_attention: bool = False
    # Small-S single-pass Pallas kernel (one program per head-block, fused
    # dropout, single-kernel backward) for self-attention at S <= 768 on
    # TPU — beats the XLA path at this framework's production shapes when
    # dropout is active (ops/attention.py measurements).  Auto-gated by
    # attention_supports_fused; off-TPU and odd shapes fall through.
    use_fused_attention: bool = True
    # Packed-layout variant of the fused kernel: q/k/v stay (B, S, H*D) —
    # the QKV projection's natural memory layout — through the custom call,
    # eliminating the (B, H, S, D) transpose copies XLA otherwise
    # materializes around every kernel invocation (~10 ms/step of the
    # 103 ms nav train step; tools/profile_nav_step.py trace).  Numerically
    # identical to the unpacked kernel (same bodies, same dropout streams).
    fused_packed_layout: bool = True
    # Longest q_len the packed variant is preferred at: S <= 512 measured
    # +8.5% end-to-end (nav); at S=768 adjacent-window A/Bs were neutral to
    # ~-2.4%, so larger shapes keep the unpacked kernel.  A config field so
    # benchmarks can probe the boundary without monkeypatching.
    fused_packed_max_seq: int = 512
    # Fused masked softmax-CE for the MLM head (ops/crossentropy.py):
    # chunked online-logsumexp over the vocabulary, per-row CE + lse only —
    # no (B, S, vocab) fp32 tensor is ever materialized (the logits stay in
    # the compute dtype).  Auto-gated: off-TPU, under any mesh, and for
    # small vocabularies the jnp path runs.
    use_fused_mlm_ce: bool = True
    # One-pass Pallas residual-add+LayerNorm (ops/layernorm.py): collapses
    # XLA's stats/apply forward passes and param-grad/dx backward passes —
    # the %convert_reduce_fusion + LN share of %multiply_reduce_fusion in
    # the round-4 trace.  Auto-gated: off-TPU, non-tiling shapes, and any
    # mesh (GSPMD cannot partition Mosaic calls) keep the flax LayerNorm.
    use_fused_layernorm: bool = True
    # Rematerialize each transformer layer in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for O(layers) less activation
    # memory — enables batch scaling beyond HBM.
    remat: bool = False
    # Set by config_for_mesh on >1-device meshes: route self-attention
    # through fused_attention_mesh (shard_map over (dp, tp)) so multi-chip
    # training keeps the Pallas kernel — GSPMD cannot partition Mosaic
    # custom calls on its own.
    attention_mesh: Any = None
    # Set by config_for_mesh on a (dp, sp) mesh: Ulysses-style sequence
    # parallelism.  Activations carry token-sharded constraints
    # P(dp, sp, None) between layers; inside self-attention the (B, H, S, D)
    # operands are constrained head-sharded P(dp, sp, None, None), so the
    # SPMD partitioner inserts the two all-to-alls per layer
    # (tokens->heads before the score matmul, heads->tokens after).
    sp_mesh: Any = None
    # Set by config_for_mesh on a (dp, cp) mesh: ring-attention context
    # parallelism.  Activations stay token-sharded over cp throughout;
    # self-attention runs ops.attention.ring_attention (shard_map, K/V
    # rotating via ppermute) — per-device attention memory O((S/cp)^2) and
    # no head-count constraint, the long-context axis past Ulysses.
    cp_mesh: Any = None

    def replace(self, **kw) -> "BertConfig":
        return dataclasses.replace(self, **kw)


def config_for_mesh(cfg: BertConfig, mesh) -> BertConfig:
    """Adapt a BertConfig for execution on a device mesh.

    The Pallas kernels (fused/flash attention) lower to Mosaic custom calls
    that GSPMD cannot auto-partition: under a >1-device mesh a jitted step
    containing one either fails to compile or silently replicates the
    attention operands (all-gathering the batch/head shards), defeating the
    sharding.  Every mesh-aware agent/trainer routes its config through
    here before building submodules.  Both kernels stay available via their
    shard_map wrappers (``attention_mesh`` ->
    ops.attention.fused_attention_mesh / flash_attention_mesh, gated per
    shape at the call site); shapes that fit neither mesh gate take XLA
    attention, which partitions cleanly."""
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return cfg
    if "sp" in getattr(mesh, "axis_names", ()) and mesh.shape["sp"] > 1:
        # Sequence parallelism: attention runs head-sharded over sp, so the
        # heads must divide the axis.  The Pallas kernels stay available via
        # their shard_map wrappers (whose in_specs perform the tokens->heads
        # reshard; ops/attention.py:_mesh_head_axis maps the head axis to
        # ``sp``); shapes that fail the mesh gates take XLA attention under
        # the sp_constrain constraints.
        assert cfg.num_attention_heads % mesh.shape["sp"] == 0, (
            f"sp={mesh.shape['sp']} must divide "
            f"num_attention_heads={cfg.num_attention_heads}")
        keep_kernels = cfg.use_fused_attention or cfg.use_flash_attention
        return cfg.replace(sp_mesh=mesh,
                           attention_mesh=mesh if keep_kernels else None)
    if "cp" in getattr(mesh, "axis_names", ()) and mesh.shape["cp"] > 1:
        # Ring-attention context parallelism: attention itself runs the
        # shard_map ring (no GSPMD partitioning of a Pallas custom call to
        # worry about), so the single-device Pallas kernels must be disabled
        # outright — under a cp mesh their gates would otherwise fire and
        # plant an unpartitionable Mosaic call in the partitioned program.
        return cfg.replace(cp_mesh=mesh, attention_mesh=None,
                           use_fused_attention=False,
                           use_flash_attention=False)
    if not (cfg.use_fused_attention or cfg.use_flash_attention):
        return cfg
    return cfg.replace(attention_mesh=mesh)


def sp_constrain(x, cfg: BertConfig, spec):
    """Apply a sequence-parallel sharding constraint (no-op off-sp/cp).

    ``spec`` is a ``PartitionSpec`` over the (dp, sp) mesh axes; used by the
    model code at the token/head resharding boundaries.  On a (dp, cp)
    ring-attention mesh the same call sites apply with the token axis
    renamed sp->cp (tokens stay cp-sharded between layers)."""
    mesh = cfg.sp_mesh
    if mesh is None:
        if cfg.cp_mesh is None:
            return x
        mesh = cfg.cp_mesh
        spec = PartitionSpec(*("cp" if a == "sp" else a for a in spec))
    from jax.sharding import NamedSharding

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _dense(features, cfg: BertConfig, name=None, use_bias=True):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


def _embed(num, cfg: BertConfig, name=None):
    return nn.Embed(
        num,
        cfg.hidden_size,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        embedding_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


class FusedResidualLayerNorm(nn.Module):
    """``LayerNorm(x [+ residual])`` with the same parameter tree as an
    ``nn.LayerNorm`` of the same ``name`` ({scale, bias}, fp32) — checkpoint
    and importer compatible (models/oscar_import.py name map unchanged).

    Routes to the one-pass Pallas kernel (ops/layernorm.py) when the
    config+shape gate passes; otherwise replicates flax's LayerNorm math
    exactly (fast-variance stats, (x-mu)*(rsqrt*scale)+bias op order, fp32
    reductions) so the CPU/test path is bit-identical to the previous
    ``nn.LayerNorm(dtype=f32)`` call sites.  Output is fp32 on the fallback
    path (call sites ``.astype(cfg.dtype)`` after, unchanged) and x.dtype on
    the kernel path (the cast is fused; the subsequent astype is a no-op)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, residual=None):
        cfg = self.cfg
        hidden = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (hidden,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (hidden,),
                          jnp.float32)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        mesh = next((m for m in (cfg.sp_mesh, cfg.cp_mesh,
                                 cfg.attention_mesh) if m is not None), None)
        if cfg.use_fused_layernorm and mesh is None \
                and layernorm_supports(rows, hidden):
            return fused_add_layernorm(x, residual, scale, bias,
                                       cfg.layer_norm_eps)
        if (cfg.use_fused_layernorm and mesh is not None and x.ndim == 3
                and layernorm_supports_mesh(mesh, x.shape[:2], hidden)):
            # Per-shard kernels via shard_map (replicated-param grads
            # accumulated outside the mesh region — ops/layernorm.py).
            return fused_add_layernorm_mesh(x, residual, scale, bias,
                                            cfg.layer_norm_eps, mesh=mesh)
        # Exact flax semantics, including the residual add in the INPUT
        # dtype (the previous call sites wrote ``ln(attn + hidden)`` — the
        # sum rounds to bf16 before promotion, and goldens pin that).
        h = x if residual is None else x + residual
        h32 = h.astype(jnp.promote_types(h.dtype, jnp.float32))
        mu = h32.mean(axis=-1)
        mu2 = (h32 * h32).mean(axis=-1)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        y = h32 - mu[..., None]
        mul = jax.lax.rsqrt(var[..., None] + cfg.layer_norm_eps) * scale
        return jnp.asarray(y * mul + bias, jnp.float32)


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    word_embed: nn.Module | None = None  # shared with the tied MLM decoder

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None, deterministic=True):
        cfg = self.cfg
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word_embed = self.word_embed
        if word_embed is None:
            word_embed = _embed(cfg.vocab_size, cfg, name="word_embeddings")
        emb = word_embed(input_ids)
        emb += _embed(cfg.max_position_embeddings, cfg, name="position_embeddings")(position_ids)
        emb += _embed(cfg.type_vocab_size, cfg, name="token_type_embeddings")(token_type_ids)
        emb = FusedResidualLayerNorm(cfg, name="layer_norm")(emb)
        emb = nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)
        return emb.astype(cfg.dtype)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, bias, history_state=None, deterministic=True):
        cfg = self.cfg
        h, d = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        b, q_len, _ = hidden.shape
        kv_in = hidden if history_state is None else jnp.concatenate([history_state, hidden], axis=1)
        # Queries over the fresh tokens only; keys/values over history + fresh
        # (modeling_bert.py:37-45). Fused QKV when there is no history.
        if history_state is None:
            qkv = _dense(3 * cfg.hidden_size, cfg, name="qkv")(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            qkv_dense = _dense(3 * cfg.hidden_size, cfg, name="qkv")
            q = qkv_dense(hidden)[..., : cfg.hidden_size]
            kv = qkv_dense(kv_in)[..., cfg.hidden_size :]
            k, v = jnp.split(kv, 2, axis=-1)
        split = lambda x: x.reshape(b, -1, h, d).transpose(0, 2, 1, 3)
        k_len = kv_in.shape[1]
        key_bias_ok = (bias is not None and bias.ndim == 4
                       and bias.shape[1] == 1 and bias.shape[2] == 1)
        use_ring = (cfg.cp_mesh is not None and key_bias_ok
                    and history_state is None
                    and attention_supports_ring(cfg.cp_mesh, q_len, k_len, b))
        fused_ok = (cfg.use_fused_attention and key_bias_ok
                    and history_state is None)
        use_fused_mesh = (
            fused_ok and cfg.attention_mesh is not None
            and attention_supports_fused_mesh(cfg.attention_mesh,
                                              q_len, k_len, d, b, h)
        )
        # Mesh attached => never the single-device fused kernel (the mesh
        # wrapper or XLA take over); mesh absent => use_fused_mesh is False.
        use_fused = (
            fused_ok and cfg.attention_mesh is None
            and attention_supports_fused(q_len, k_len, d)
        )
        # Long-sequence blockwise kernel: with a mesh attached the plain
        # kernel is never used (GSPMD cannot partition it) — the shard_map
        # wrapper takes over when batch/heads divide the mesh axes.
        use_flash_mesh = (
            not (use_fused or use_fused_mesh)
            and cfg.use_flash_attention and key_bias_ok
            and cfg.attention_mesh is not None
            and attention_supports_flash_mesh(cfg.attention_mesh,
                                              q_len, k_len, d, b, h)
        )
        use_flash = (
            not (use_fused or use_fused_mesh)
            and cfg.use_flash_attention and key_bias_ok
            and cfg.attention_mesh is None
            and attention_supports_flash(q_len, k_len, d)
        )
        if use_ring:
            # Ring-attention context parallelism: K/V blocks rotate around
            # the cp axis; dropout is a global-coordinate position hash, so
            # one scalar seed serves every shard with no stream reuse.
            rate = 0.0 if deterministic else float(cfg.attention_probs_dropout_prob)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32)
            ctx = ring_attention(split(q), split(k), split(v),
                                 bias[:, 0, 0, :], seed, rate,
                                 mesh=cfg.cp_mesh)
        elif use_fused or use_fused_mesh:
            rate = 0.0 if deterministic else float(cfg.attention_probs_dropout_prob)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32)
            # Packed pays off where the transpose copies dominate the extra
            # in-kernel lane slicing (see fused_packed_max_seq).
            prefer_packed = (cfg.fused_packed_layout
                             and q_len <= cfg.fused_packed_max_seq)
            if use_fused_mesh and prefer_packed:
                out = fused_attention_mesh_packed(
                    q, k, v, bias[:, 0, 0, :], h, seed, rate,
                    mesh=cfg.attention_mesh).astype(cfg.dtype)
                if cfg.sp_mesh is not None:
                    # Same token-sharded placement the unpacked paths pin
                    # below — without it the packed (B, S, H*D) output stays
                    # column-sharded and GSPMD infers the all-to-all.
                    out = sp_constrain(out, cfg,
                                       PartitionSpec("dp", "sp", None))
                return out
            elif use_fused_mesh:
                ctx = fused_attention_mesh(split(q), split(k), split(v),
                                           bias[:, 0, 0, :], seed, rate,
                                           mesh=cfg.attention_mesh)
            elif prefer_packed:
                # Packed path: q/k/v/out stay (B, S, H*D) — no transpose
                # copies around the custom call (see the config flag).
                out = fused_attention_packed(
                    q, k, v, bias[:, 0, 0, :], h, seed, rate
                ).astype(cfg.dtype)
                if cfg.sp_mesh is not None:
                    out = sp_constrain(out, cfg,
                                       PartitionSpec("dp", "sp", None))
                return out
            else:
                ctx = fused_attention(split(q), split(k), split(v),
                                      bias[:, 0, 0, :], seed, rate)
        elif use_flash or use_flash_mesh:
            # Training path included: attention-prob dropout is fused into the
            # kernels (mask recomputed in bwd from a position hash) — the
            # (B, H, Q, K) probability tensor never touches HBM.
            rate = 0.0 if deterministic else float(cfg.attention_probs_dropout_prob)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32)
            if use_flash_mesh:
                ctx = flash_attention_mesh(split(q), split(k), split(v),
                                           bias[:, 0, 0, :], seed, rate,
                                           mesh=cfg.attention_mesh)
            else:
                ctx = flash_attention(split(q), split(k), split(v),
                                      bias[:, 0, 0, :], seed, rate)
        else:
            q4, k4, v4 = split(q), split(k), split(v)
            if cfg.sp_mesh is not None:
                # tokens -> heads reshard (all-to-all #1): attention needs the
                # full sequence per head, so shard the head axis instead.
                head_spec = PartitionSpec("dp", "sp", None, None)
                q4 = sp_constrain(q4, cfg, head_spec)
                k4 = sp_constrain(k4, cfg, head_spec)
                v4 = sp_constrain(v4, cfg, head_spec)
            ctx = multi_head_attention(
                q4, k4, v4, bias=bias,
                dropout_rng=None if deterministic else self.make_rng("dropout"),
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic,
            )
            if cfg.sp_mesh is not None:
                ctx = sp_constrain(ctx, cfg,
                                   PartitionSpec("dp", "sp", None, None))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, q_len, cfg.hidden_size)
        if cfg.sp_mesh is not None:
            # heads -> tokens reshard (all-to-all #2): the output projection,
            # residual and MLP all compute on 1/sp of the tokens.
            ctx = sp_constrain(ctx, cfg, PartitionSpec("dp", "sp", None))
        return ctx.astype(cfg.dtype)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, bias, history_state=None, deterministic=True):
        cfg = self.cfg
        attn = BertSelfAttention(cfg, name="attention")(
            hidden, bias, history_state, deterministic)
        attn = _dense(cfg.hidden_size, cfg, name="attention_output")(attn)
        attn = nn.Dropout(cfg.hidden_dropout_prob)(attn, deterministic=deterministic)
        hidden = FusedResidualLayerNorm(
            cfg, name="attention_layer_norm")(attn, hidden).astype(cfg.dtype)
        inter = _dense(cfg.intermediate_size, cfg, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = _dense(cfg.hidden_size, cfg, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        hidden = FusedResidualLayerNorm(
            cfg, name="output_layer_norm")(out, hidden).astype(cfg.dtype)
        return sp_constrain(hidden, cfg, PartitionSpec("dp", "sp", None))


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, bias, history_states=None, deterministic=True):
        layer_cls = BertLayer
        if self.cfg.remat:
            # Save only each layer's input; recompute the layer in bwd
            # (dot products excluded from recompute via the standard policy).
            # static_argnums indexes the full __call__ signature (0 = module
            # instance): 4 is ``deterministic``.
            layer_cls = nn.remat(
                BertLayer, static_argnums=(4,),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        for i in range(self.cfg.num_hidden_layers):
            hs = None if history_states is None else history_states[i]
            hidden = layer_cls(self.cfg, name=f"layer_{i}")(
                hidden, bias, hs, deterministic)
        return hidden


class BertPooler(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        return nn.tanh(_dense(self.cfg.hidden_size, self.cfg, name="dense")(first))


class VisitronBert(nn.Module):
    """BertImgModelwithLocationEmbeds parity (encoder.py:161-303).

    Joint sequence = [text tokens] ++ [projected image regions]; returns
    (sequence_output, pooled_output).  ``attend_vocab`` exposes the transposed
    word-embedding matmul for the tied MLM decoder (encoder.py:332-335).
    """

    cfg: BertConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = _embed(cfg.vocab_size, cfg, name="word_embeddings")
        self.embeddings = BertEmbeddings(cfg, word_embed=self.word_embeddings, name="embeddings")
        self.encoder = BertEncoder(cfg, name="encoder")
        self.pooler = BertPooler(cfg, name="pooler")
        self.img_embedding = _dense(cfg.hidden_size, cfg, name="img_embedding")
        self.location_embeds = _dense(cfg.hidden_size, cfg, name="location_embeds")
        if cfg.use_img_layernorm:
            self.img_layer_norm = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="img_layer_norm")
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def attend_vocab(self, x):
        """(..., H) -> (..., vocab) logits against the tied word embeddings."""
        return self.word_embeddings.attend(x.astype(self.cfg.dtype))

    def embed_joint(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        position_ids=None,
        img_feats=None,
        img_location_embeddings=None,
        history_states=None,
        deterministic=True,
    ):
        """Everything before the transformer stack: text + image embeddings
        fused into the joint sequence, plus the attention bias.  Split out of
        ``__call__`` so pipeline-parallel execution (parallel/pipeline.py) can
        run it replicated while the encoder layers are stage-sharded."""
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        emb = self.embeddings(input_ids, token_type_ids, position_ids, deterministic)
        if history_states is not None and img_feats is not None:
            raise ValueError("cannot take image features while using encoder history states")
        if img_feats is not None:
            img = self.img_embedding(img_feats.astype(cfg.dtype))
            img += self.location_embeds(img_location_embeddings.astype(cfg.dtype))
            if cfg.use_img_layernorm:
                img = self.img_layer_norm(img).astype(cfg.dtype)
            img = self.img_dropout(img, deterministic=deterministic)
            emb = jnp.concatenate([emb, img], axis=1)
            assert attention_mask.shape[-1] == emb.shape[1], (
                "attention_mask must cover text + image tokens")
        key_len = emb.shape[1]
        if history_states is not None:
            key_len += history_states[0].shape[1]
        if attention_mask.shape[-1] != key_len:
            # Extend over prepended history (always visible).
            pad = jnp.ones(
                attention_mask.shape[:-1] + (key_len - attention_mask.shape[-1],),
                attention_mask.dtype,
            )
            attention_mask = jnp.concatenate([pad, attention_mask], axis=-1)
        bias = make_attention_bias(attention_mask)
        # Sequence parallelism: the joint sequence enters the encoder
        # token-sharded; the (B, 1, 1, K) bias stays replicated (every head
        # shard attends over the full key length).
        emb = sp_constrain(emb, cfg, PartitionSpec("dp", "sp", None))
        return emb, bias

    def __call__(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        position_ids=None,
        img_feats=None,
        img_location_embeddings=None,
        history_states=None,
        deterministic=True,
    ):
        emb, bias = self.embed_joint(
            input_ids, token_type_ids, attention_mask, position_ids,
            img_feats, img_location_embeddings, history_states, deterministic)
        seq = self.encoder(emb, bias, history_states, deterministic)
        pooled = self.pooler(seq)
        return seq, pooled


class BertTextModel(nn.Module):
    """Text-only view of VisitronBert (used by OscarEncoder); shares parameter
    structure so checkpoints are interchangeable."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 position_ids=None, deterministic=True):
        return VisitronBert(self.cfg, name="bert")(
            input_ids,
            token_type_ids=token_type_ids,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
