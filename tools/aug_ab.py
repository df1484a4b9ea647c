"""Back-translation augmentation efficacy A/B on a learnable synthetic world.

The plain SyntheticWorld's dialogs are random word salad, so language->action
is unlearnable and --aug_data cannot help by construction.  This A/B uses
``directional_language=True`` worlds (instructions describe the path as
relative turn words), making generalization to HELD-OUT episodes meaningful:

  1. train a speaker (trajectory -> instruction) on the train split;
  2. caption sampled shortest-path walks -> R2R-format aug records
     (exactly the `run.py speaker` / `augment` / `--aug_data` flow);
  3. fine-tune the viewpoint follower with the SAME iteration budget on
     (A) train only vs (B) train + aug;
  4. report GP/SR/SPL/nDTW on held-out episodes for both arms.

Prints one JSON line per evaluation; the final two lines are the A/B result.
Usage: python tools/aug_ab.py [--iters 800] [--n-aug 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_hops(sentence: str) -> list[str] | None:
    """Parse a directional sentence into its per-hop turn categories.

    Grammar (testing/synthetic.py:_directional_sentence): ``go`` then for each
    hop ``straight`` | ``turn left`` | ``turn right`` | ``turn around``
    followed by ``then``, closed with ``stop there``.  Returns the category
    list (e.g. ["straight", "left"]) or None if the text doesn't parse."""
    toks = sentence.split()
    if not toks or toks[0] != "go":
        return None
    body = toks[1:]
    if body[-2:] == ["stop", "there"]:
        body = body[:-2]
    hops: list[str] = []
    i = 0
    while i < len(body):
        if body[i] == "straight":
            hops.append("straight")
            i += 1
        elif body[i] == "turn" and i + 1 < len(body) and body[i + 1] in (
                "left", "right", "around"):
            hops.append(body[i + 1])
            i += 2
        else:
            return None
        if i < len(body) and body[i] == "then":
            i += 1
    return hops


def caption_fidelity(records: list[dict], world, runtime) -> dict:
    """Score captions against the world's oracle directional sentences.

    The probe that closes the loop on the aug A/B: ``hop_acc`` (per-hop turn
    -category accuracy over aligned positions), ``exact`` (full-sentence
    category match), ``parse`` (fraction of captions in the directional
    grammar at all), ``len_mae`` (mean |caption hops - oracle hops|)."""
    n = len(records)
    parsed = exact = 0
    hop_hits = hop_total = 0
    len_err = 0.0
    for rec in records:
        g = world.graphs[rec["scan"]]
        oracle = parse_hops(world._directional_sentence(
            g, [g.index[p] for p in rec["path"]], rec["heading"]))
        cap = parse_hops(rec["instructions"][0])
        assert oracle is not None
        if cap is None:
            len_err += len(oracle)
            hop_total += len(oracle)
            continue
        parsed += 1
        exact += cap == oracle
        m = min(len(cap), len(oracle))
        hop_hits += sum(c == o for c, o in zip(cap[:m], oracle[:m]))
        hop_total += max(len(cap), len(oracle))
        len_err += abs(len(cap) - len(oracle))
    return {"n": n, "parse": round(parsed / n, 3), "exact": round(exact / n, 3),
            "hop_acc": round(hop_hits / max(hop_total, 1), 3),
            "len_mae": round(len_err / n, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--speaker-iters", type=int, default=600)
    ap.add_argument("--n-aug", type=int, default=300)
    ap.add_argument("--train-episodes", type=int, default=150)
    ap.add_argument("--val-episodes", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--episode-len", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--keep-frac", type=float, default=0.0,
                    help="speaker-CE quality gate: over-generate 1/frac "
                         "candidates, keep the best n (0 = no gate)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="caption sampling temperature (EnvDrop samples its "
                         "augmentation captions; 0 = greedy)")
    ap.add_argument("--arms", default="baseline,aug",
                    help="comma list of arms to run: baseline (train only), "
                         "aug (train + aug), aug_only (aug records alone — "
                         "a caption-faithfulness probe: positive held-out GP "
                         "is only possible if the captions actually describe "
                         "their walks), real_only (n-aug FRESH real episodes "
                         "alone — the probe's calibration ceiling: what "
                         "perfect records score under the same budget)")
    ap.add_argument("--targets", action="store_true",
                    help="stamp aug records with sampled targets so they get "
                         "the NDH sequence format ([TAR] span) — without "
                         "this, aug sequences are a population the NDH val "
                         "split never shows (--aug_targets equivalent)")
    ap.add_argument("--oracle-captions", action="store_true",
                    help="caption the sampled walks with the world's ground-"
                         "truth directional sentence instead of the speaker "
                         "(skips speaker training) — the perfect-speaker "
                         "upper bound: separates the augmentation MECHANISM "
                         "from speaker caption quality")
    ap.add_argument("--aug-seed", type=int, default=3,
                    help="rng seed for walk sampling / caption generation "
                         "(vary for spread estimates; arms and speaker "
                         "training stay seed-pinned)")
    ap.add_argument("--feat-dropout", type=float, default=0.0,
                    help="EnvDrop-style speaker feature dropout on visual "
                         "dims (angle features kept)")
    ap.add_argument("--movement-frame", action="store_true",
                    help="speaker action-angle features in the turn-delta "
                         "frame (relative to the previous move's exact "
                         "heading) instead of the snapped current view")
    ap.add_argument("--seed", type=int, default=88,
                    help="training seed: agent/speaker init + batcher "
                         "shuffles (the WORLD stays seed-13 — the dataset is "
                         "held fixed across the seed spread; aug walk "
                         "sampling keeps --aug-seed)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host-CPU backend (JAX_PLATFORMS env is "
                         "overridden by the relay sitecustomize; only "
                         "jax.config wins)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.agents.speaker import (SpeakerAgent, build_aug_instances,
                                             write_aug_records)
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.evaluation import Evaluator
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS

    feat_dim = 64
    world = SyntheticWorld(seed=13, num_scans=3, viewpoints_per_scan=40,
                           scene_feat_dim=feat_dim, dialog_turns=(0, 1),
                           directional_language=True)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=1024))
    with tempfile.TemporaryDirectory() as d:
        world.write_task_data(d, counts={"train": args.train_episodes,
                                         "val_unseen": args.val_episodes})
        train_inst = build_nav_instances(d, ["train"], tok,
                                         max_seq_length=args.seq)
        val_inst = build_nav_instances(d, ["val_unseen"], tok,
                                       max_seq_length=args.seq)

    cfg = BertConfig(vocab_size=len(tok), hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=256,
                     max_position_embeddings=args.seq, type_vocab_size=4,
                     dtype=jnp.bfloat16)
    evaluator = Evaluator([it.raw for it in val_inst], world.graphs,
                          path_type="planner_path")

    def make_agent():
        return ViewpointAgent(cfg, runtime, feature_dim=feat_dim,
                              episode_len=args.episode_len, rnn_dim=128,
                              encoder_hidden_size=128, aemb=32,
                              max_seq_length=args.seq, learning_rate=1e-4,
                              seed=args.seed)

    def evaluate(agent, params, tag):
        vb = NavEpisodeBatcher(val_inst, runtime, batch_size=args.batch,
                               path_type="planner_path")
        results = agent.test(params, vb.eval_batches(), feedback="argmax")
        scored = {k: v for k, v in results.items() if k in evaluator.instr_ids}
        summary, _ = evaluator.score_results(scored)
        line = {"tag": tag,
                "gp": round(summary["dist_to_end_reduction"], 3),
                "sr": round(summary["success_rate"], 3),
                "spl": round(summary["spl"], 3),
                "ndtw": round(summary["ndtw"], 3)}
        print(json.dumps(line), flush=True)
        return line

    # -- speaker training + augmentation -------------------------------------
    sp = SpeakerAgent(runtime=runtime, feature_dim=feat_dim,
                      vocab_size=len(tok), bos_id=tok.vocab[tok.cls_token],
                      eos_id=tok.vocab[tok.sep_token],
                      pad_id=tok.pad_token_id, episode_len=args.episode_len,
                      max_words=48, hidden_size=128, wemb=64,
                      learning_rate=1e-3, movement_frame=args.movement_frame,
                      feat_dropout=args.feat_dropout, seed=args.seed)
    if args.oracle_captions:
        # Perfect-speaker upper bound: sample the same walk distribution but
        # caption each walk with the world's ground-truth directional
        # sentence (what an ideal speaker would converge to).
        aug_rng = np.random.default_rng(args.aug_seed)
        walks = sp.sample_walks(aug_rng, args.n_aug, min_hops=2,
                                max_hops=args.episode_len - 2)
        records = []
        for i in range(args.n_aug):
            scan = walks["scans"][i]
            g = world.graphs[scan]
            off = runtime.feat_table.scan_offsets[scan]
            path = g.shortest_path(int(walks["start_rows"][i]) - off,
                                   int(walks["goal_rows"][i]) - off)
            rec = {"scan": scan,
                   "path": path,
                   "heading": walks["headings"][i],
                   "path_id": f"AUG_{i}",
                   "instructions": [world._directional_sentence(
                       g, [g.index[p] for p in path], walks["headings"][i])]}
            if args.targets:
                rec["target"] = str(aug_rng.choice(_TARGETS))
            records.append(rec)
    else:
        sp_batcher = NavEpisodeBatcher(train_inst, runtime,
                                       batch_size=args.batch,
                                       path_type="planner_path",
                                       seed=args.seed)
        text_by_idx = {i.inst_idx: SpeakerAgent.instance_text(i)
                       for i in train_inst}
        sp_state = sp.init_state()
        sp_step = sp.train_step_fn()
        for it, batch in enumerate(sp_batcher.train_batches(
                args.speaker_iters, episode_len=args.episode_len), 1):
            sp_state, loss = sp_step(
                sp_state, sp.attach_words(batch, tok, text_by_idx))
            if it % 100 == 0:
                print(json.dumps({"tag": "speaker", "step": it,
                                  "word_ce": round(float(loss), 4)}), flush=True)

        records = sp.augment(sp_state["params"], tok,
                             np.random.default_rng(args.aug_seed),
                             args.n_aug, min_hops=2,
                             max_hops=args.episode_len - 2,
                             temperature=args.temperature,
                             keep_fraction=args.keep_frac or None,
                             target_vocab=list(_TARGETS) if args.targets else None)
    with tempfile.TemporaryDirectory() as d:
        aug_path = os.path.join(d, "aug.json")
        write_aug_records(records, aug_path)
        aug_inst = build_aug_instances(aug_path, tok, max_seq_length=args.seq)
    print(json.dumps({"tag": "aug", "records": len(records),
                      "instances": len(aug_inst)}), flush=True)
    print(json.dumps({"tag": "fidelity",
                      **caption_fidelity(records, world, runtime)}), flush=True)

    # -- the arms, same budget -------------------------------------------------
    arm_instances = {"baseline": train_inst,
                     "aug": train_inst + aug_inst,
                     "aug_only": aug_inst}
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    if "real_only" in arms:
        # Calibration ceiling for the aug_only probe: the SAME record count of
        # FRESH real episodes (continuing the world's rng stream, so disjoint
        # from train/val), trained alone under the identical budget.  The
        # aug_only:real_only ratio — not aug_only:baseline — isolates caption
        # quality from the probe's own population/budget effects.
        with tempfile.TemporaryDirectory() as d:
            world.write_task_data(d, counts={"train": args.n_aug})
            arm_instances["real_only"] = build_nav_instances(
                d, ["train"], tok, max_seq_length=args.seq)
    results = {}
    for tag, instances in ((a, arm_instances[a]) for a in arms):
        agent = make_agent()
        batcher = NavEpisodeBatcher(instances, runtime, batch_size=args.batch,
                                    path_type="planner_path", seed=args.seed)
        state = agent.init_state()
        step = agent.train_step_fn()
        for i, batch in enumerate(batcher.train_batches(
                args.iters, episode_len=args.episode_len)):
            jb = {k: np.asarray(v) for k, v in batch.items()
                  if not isinstance(v, list)}
            state, loss = step(state, jb)
            if (i + 1) % 200 == 0:
                print(json.dumps({"tag": f"train_{tag}", "step": i + 1,
                                  "loss": round(float(loss), 4)}), flush=True)
        results[tag] = evaluate(agent, state["params"], f"val_{tag}")

    if "aug" in results and "baseline" in results:
        delta = {k: round(results["aug"][k] - results["baseline"][k], 3)
                 for k in ("gp", "sr", "spl", "ndtw")}
        print(json.dumps({"tag": "delta_aug_minus_baseline", **delta}), flush=True)


if __name__ == "__main__":
    main()
