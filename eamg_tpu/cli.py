"""EAMG-TPU command-line interface.

Covers every entry point the reference exposed as loose scripts:

  python -m eamg_tpu.cli train     --preset large2 --csv lmd_full.csv
  python -m eamg_tpu.cli generate  --checkpoint ckpt/final --bpm 180 \
                                   --key "A minor" --instruments Violin Piano
  python -m eamg_tpu.cli generate  --interactive        # generate_adi.py
  python -m eamg_tpu.cli serve     --port 8000          # api_cache.py
  python -m eamg_tpu.cli analyze   --csv lmd_full.csv   # data_analysis.py
  python -m eamg_tpu.cli tokenize  --midi-dir lmd_full/ --out corpus.csv
  python -m eamg_tpu.cli convert-pt --pt music_generator.pt --out ckpt/
  python -m eamg_tpu.cli convert-distilbert --hf-dir distilbert-final \
                                   --out emotion_ckpt/
  python -m eamg_tpu.cli finetune-emotion --tsv goemotions.tsv ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _load_generator(checkpoint: str | None):
    """-> (Generator, scheme, scheme_b|None). No --checkpoint serves the
    packaged trained demo (serve/demo_ckpt) when shipped, else the
    random-init demo pipeline."""
    from .decode import Generator
    from .tokenizer import SchemeB3, Vocab, detect_scheme

    if not checkpoint:
        from .serve.pipeline import packaged_demo_checkpoint

        checkpoint = packaged_demo_checkpoint()
    if checkpoint:
        from .utils import load_checkpoint

        ckpt = load_checkpoint(checkpoint)
        vocab = Vocab(ckpt["vocab"])
        scheme = detect_scheme(vocab)
        if scheme == "b3":
            gen = Generator(ckpt["params"], ckpt["cfg"], vocab,
                            eos_token="[END_SEQ]")
            return gen, "b3", SchemeB3(seq_len=ckpt["cfg"].seq_len)
        return (Generator(ckpt["params"], ckpt["cfg"], vocab), scheme,
                None)
    from .serve.pipeline import demo_pipeline

    return demo_pipeline().generator, "a", None


def cmd_train(args):
    from .train.run import run_training

    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from .parallel import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    summary = run_training(
        args.preset, csv_path=args.csv, synthetic_rows=args.synthetic,
        max_rows=args.max_rows, out_dir=args.out, scheme=args.scheme,
        epochs=args.epochs, save_every_steps=args.save_every,
        save_hours=args.save_hours, mesh=mesh, seed=args.seed,
        log_every=args.log_every, resume_from=args.resume,
        corrected=args.corrected,
        tp=args.mesh_model > 1, fsdp=args.fsdp, pack=args.pack,
        geometry={"d_model": args.d_model, "n_head": args.n_head,
                  "n_layer": args.n_layer, "seq_len": args.seq_len,
                  "n_experts": args.experts,
                  "attn_block": args.attn_block,
                  "moe_every": args.moe_every if args.experts else None})
    print(json.dumps(summary))


def cmd_generate(args):
    from .audio import render_to_wav
    from .tokenizer import (assemble_prompt, closest_bpm_token,
                            normalize_key_signature, tokens_to_song)

    gen, scheme, scheme_b = _load_generator(args.checkpoint)
    bpm, key = args.bpm, args.key
    if args.interactive:
        # generate_adi.py flow: free text -> emotion -> mapping -> music
        from .emotion import EmotionClassifier, get_music_params

        clf = EmotionClassifier()
        text = input("Enter a description or feeling: ")
        label = clf.predict(text)
        mapping = get_music_params(label, seed=args.seed)
        print("Music Mapping:", mapping)
        bpm, key = mapping["bpm"], mapping["key"]
        prompt = None if scheme == "b3" else assemble_prompt(
            gen.vocab, mapping, full_gm=args.full_gm)
    elif scheme == "b3":
        prompt = None
    else:
        # generate_music/generate.py flow: fixed controls
        prompt = ["[START_SEQUENCE]",
                  closest_bpm_token(gen.vocab, bpm),
                  normalize_key_signature(key)]
        prompt += [f"[INSTRUMENT] {i}" for i in args.instruments]
    if scheme == "b3":
        # control-token conditioning; [INSTRUMENT] has no B3 equivalent
        if args.instruments != ["Violin", "Acoustic Grand Piano"] and \
                not args.interactive:
            print("note: --instruments ignored (B3 checkpoints have no "
                  "instrument tokens)")
        prompt_ids = scheme_b.control_prefix(bpm, key)
    else:
        # data-dependent Scheme-A vocabularies may lack a control token
        # (e.g. --key C when the corpus only saw "C major"); drop and
        # report instead of crashing, matching the serve pipeline.
        dropped = [t for t in prompt if t not in gen.vocab]
        if dropped:
            print(f"note: dropped prompt tokens not in this checkpoint's "
                  f"vocabulary: {dropped}")
            prompt = [t for t in prompt if t in gen.vocab]
        prompt_ids = gen.vocab.encode(prompt)
    penalties = (args.repetition_penalty, args.frequency_penalty,
                 args.presence_penalty)
    if penalties == (1.0, 0.0, 0.0):
        penalties = None
    gram = None
    if args.grammar:
        from .decode.grammar import grammar_a, grammar_for

        gram = grammar_for(scheme_b) if scheme == "b3" \
            else grammar_a(gen.vocab)
    if sum(map(bool, (args.beams, args.draft, args.lookup,
                      args.medusa))) > 1:
        raise SystemExit("--beams, --draft, --lookup and --medusa are "
                         "mutually exclusive")
    if args.beams:
        if penalties is not None or args.no_repeat_ngram:
            raise SystemExit("--beams is a deterministic argmax-tree "
                             "search; penalties/n-gram transforms are "
                             "sampling-path features (--grammar composes)")
        if scheme == "b3":
            ids = gen.generate_ids_beam(prompt_ids, max_len=args.max_len,
                                        n_beams=args.beams,
                                        length_penalty=args.length_penalty,
                                        grammar=gram)
            tokens = scheme_b.vocab.decode(ids)
        else:
            tokens = gen.sample_beam(prompt, max_len=args.max_len,
                                     n_beams=args.beams,
                                     length_penalty=args.length_penalty,
                                     grammar=gram)
            ids = gen.vocab.encode(tokens)
    elif args.draft or args.lookup or args.medusa:
        flag = ("--draft" if args.draft
                else "--lookup" if args.lookup else "--medusa")
        if penalties is not None or args.no_repeat_ngram or gram:
            raise SystemExit(f"{flag} does not support penalties, n-gram "
                             "bans or grammar constraints yet (history-"
                             "dependent distributions break the "
                             "proposal/target acceptance math)")
        if args.medusa:
            from .tools.medusa import load_medusa_heads

            ids = gen.generate_ids_medusa(
                load_medusa_heads(args.medusa), prompt_ids,
                max_len=args.max_len, gamma=args.gamma,
                temperature=args.temperature, top_k=args.top_k,
                seed=args.seed, top_p=args.top_p, min_p=args.min_p)[0]
        elif args.draft:
            draft, _, _ = _load_generator(args.draft)
            ids = gen.generate_ids_speculative(
                draft, prompt_ids, max_len=args.max_len,
                gamma=args.gamma, temperature=args.temperature,
                top_k=args.top_k, seed=args.seed, top_p=args.top_p,
                min_p=args.min_p)[0]
        else:
            ids = gen.generate_ids_lookup(
                prompt_ids, max_len=args.max_len, gamma=args.gamma,
                ngram=args.lookup_ngram, temperature=args.temperature,
                top_k=args.top_k, seed=args.seed, top_p=args.top_p,
                min_p=args.min_p)[0]
        tokens = scheme_b.vocab.decode(ids) if scheme == "b3" \
            else gen.trim_at_eos(ids)
    elif scheme == "b3":
        ids = gen.generate_ids(prompt_ids, max_len=args.max_len,
                               temperature=args.temperature,
                               top_k=args.top_k, seed=args.seed,
                               top_p=args.top_p, min_p=args.min_p,
                               penalties=penalties,
                               no_repeat_ngram=args.no_repeat_ngram,
                               grammar=gram)[0]
        tokens = scheme_b.vocab.decode(ids)
    else:
        tokens = gen.sample_kvcache(prompt, max_len=args.max_len,
                                    temperature=args.temperature,
                                    top_k=args.top_k, seed=args.seed,
                                    top_p=args.top_p, min_p=args.min_p,
                                    penalties=penalties,
                                    no_repeat_ngram=args.no_repeat_ngram,
                                    grammar=gram)
    print("Generated token snippet:", tokens[:20], "...")
    song = scheme_b.decode_to_song(ids) if scheme == "b3" \
        else tokens_to_song(tokens)
    song.write(args.out)
    print("MIDI saved ->", args.out)
    if args.wav:
        render_to_wav(song, args.wav, seed=args.seed)
        print("WAV saved ->", args.wav)


def cmd_feed_bench(args):
    from .tools.feed_bench import run_feed_bench

    print(json.dumps(run_feed_bench(rows=args.rows, notes=args.notes,
                                    steps=args.steps,
                                    shards=args.shards)))


def cmd_section_eval(args):
    from .serve.pipeline import (packaged_demo_checkpoint,
                                 pipeline_from_checkpoint)
    from .tools.section_metrics import measure_section_obedience

    pipe = pipeline_from_checkpoint(args.ckpt
                                    or packaged_demo_checkpoint())
    out = measure_section_obedience(pipe, n_prompts=args.prompts,
                                    seed=args.seed)
    print(json.dumps(out))


def cmd_ablate(args):
    """Paper §10.4 ablation table: full / −KV / −emotion / −fine-bins."""
    from .tools.ablation import AblationConfig, markdown_table, run_ablation

    acfg = AblationConfig(
        csv_path=args.csv, n_rows=args.synthetic, max_rows=args.max_rows,
        seq_len=args.seq_len, d_model=args.d_model, n_head=args.n_head,
        n_layer=args.n_layer, epochs=args.epochs, seed=args.seed,
        dtype=args.dtype, jitter_ms=args.jitter_ms)
    rows = run_ablation(acfg)
    table = markdown_table(rows)
    print(table)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write("# §10.4 ablation table\n\n" + table + "\n")
        print("written ->", args.out)


def cmd_analyze(args):
    from .tools.analysis import analyze_corpus, write_report

    stats = analyze_corpus(args.csv, max_rows=args.max_rows)
    write_report(stats, args.out)
    print(f"analyzed {stats['rows']} rows -> {args.out}")


def cmd_tokenize(args):
    from .tools.corpus import build_corpus_csv

    result = build_corpus_csv(args.midi_dir, args.out,
                              max_files=args.max_files, log_fn=print)
    print(json.dumps(result))


def cmd_convert_pt(args):
    from .tools.convert import convert_reference_pt

    convert_reference_pt(args.pt, args.out, serving_arch=args.serving_arch)
    print("converted ->", args.out)


def cmd_export_pt(args):
    from .models.import_torch import export_reference_checkpoint
    from .utils import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = ckpt["cfg"]
    # the .pt payload carries only geometry — arch semantics live in the
    # LOADER script the reference user picks. Default the key dialect from
    # the checkpoint's LN placement (post-LN weights belong in train_*.py /
    # api.py, pre-LN/GELU weights in api_cache.py's GPTWithKV), and warn
    # about any flag the reference scripts cannot represent.
    dialect = args.dialect or (
        "kv" if cfg.ln_placement == "pre" else "trainer")
    canon_loader = "kv" if cfg.ln_placement == "pre" else "trainer"
    if dialect != canon_loader:
        print(f"warning: checkpoint is {cfg.ln_placement}-LN but the "
              f"{dialect} dialect targets the "
              f"{'pre' if dialect == 'kv' else 'post'}-LN reference "
              f"loader — outputs will differ from this checkpoint's "
              f"native forward")
    dropped = [f"{k}={getattr(cfg, k)}" for k, default in (
        ("causal", False), ("batch_first_bug", False),
        ("pos_broadcast_bug", False), ("n_experts", None),
        ("n_kv_heads", None)) if getattr(cfg, k) != default]
    if dropped:
        print("warning: the reference .pt payload cannot represent these "
              "arch flags (they are dropped; reference scripts will run "
              "their own defaults): " + ", ".join(dropped))
    export_reference_checkpoint(args.pt, ckpt["params"], ckpt["vocab"],
                                cfg, dialect=dialect)
    print(f"exported -> {args.pt} ({dialect} dialect; loadable by "
          f"the reference's torch scripts via torch.load + strict "
          f"load_state_dict)")


def cmd_convert_gqa(args):
    from .models.gqa_convert import convert_checkpoint_dir

    convert_checkpoint_dir(args.ckpt, args.out, args.kv_heads)
    print(f"converted -> {args.out} (n_kv_heads={args.kv_heads}; run a "
          f"short finetune to recover quality: cli train --resume)")


def cmd_medusa_measure(args):
    from .tools.medusa import measure, measure_tree

    ckpt = args.ckpt
    if ckpt is None:
        from .serve.pipeline import packaged_demo_checkpoints

        ckpt = packaged_demo_checkpoints()["a"]
    heads = args.heads or f"{ckpt}/medusa_heads.pkl"
    res = {}
    if args.tree:
        res["tree"] = measure_tree(ckpt, heads, max_len=args.max_len,
                                   reps=args.reps)
    else:
        res["linear"] = measure(ckpt, heads, max_len=args.max_len,
                                gamma=4, greedy=not args.sample)
    print(json.dumps(res))


def cmd_train_medusa(args):
    from .tools.medusa import MedusaSpec, measure, train_medusa_heads

    ckpt = args.ckpt
    if ckpt is None:
        from .serve.pipeline import packaged_demo_checkpoints

        ckpt = packaged_demo_checkpoints()["b3"]
    out = train_medusa_heads(ckpt, args.out, MedusaSpec(
        n_heads=args.heads, rows=args.rows, epochs=args.epochs,
        batch=args.batch, lr=args.lr, seed=args.seed))
    res = {"train": {k: v for k, v in out.items() if k != "blocks"}}
    if args.measure:
        res["measure"] = measure(ckpt, args.out, max_len=args.max_len,
                                 gamma=args.heads, greedy=not args.sample)
    print(json.dumps(res))


def cmd_gqa_recover(args):
    from .tools.gqa_recover import RecoveryConfig, run_gqa_recovery

    ckpt = args.ckpt
    if ckpt is None:
        from .serve.pipeline import packaged_demo_checkpoints

        ckpt = packaged_demo_checkpoints()["b3"]
    res = run_gqa_recovery(RecoveryConfig(
        ckpt_dir=ckpt, kv_heads=args.kv_heads, out_dir=args.out,
        rows=args.rows, steps=args.steps, lr=args.lr, seed=args.seed))
    print(json.dumps(res))


def cmd_convert_distilbert(args):
    from .tools.convert import convert_hf_distilbert

    convert_hf_distilbert(args.hf_dir, args.out, lora_alpha=args.alpha)
    print("converted ->", args.out)


def cmd_emotion(args):
    """Emotion demo: predict + EATS mapping (emotion_analysis/main.py)."""
    from .emotion import EmotionClassifier, get_music_params

    clf = EmotionClassifier()
    label = clf.predict(args.text)
    mapping = get_music_params(label, seed=args.seed)
    print(json.dumps({"label": label, "mapping": mapping,
                      "top_k": clf.predict_top_k_labels(args.text, k=3)}))


def cmd_export_emotion_hf(args):
    from .tools.publish import export_emotion_hf, push_to_hub

    export_emotion_hf(args.ckpt, args.out)
    print("exported HF snapshot ->", args.out)
    if args.push:
        push_to_hub(args.out, args.push)
        print("pushed ->", args.push)


def cmd_train_demo_a(args):
    from .tools.demo_a import DemoASpec, flagship_spec, train_demo_a

    if args.geometry == "flagship":
        spec = flagship_spec(seed=args.seed)
        over = {k: v for k, v in
                [("epochs", args.epochs), ("rows", args.rows),
                 ("heldout_rows", args.heldout_rows),
                 ("kv_heads", args.kv_heads)] if v is not None}
        spec = dataclasses.replace(spec, **over)
    else:
        spec = DemoASpec(rows=args.rows or 12000,
                         heldout_rows=args.heldout_rows or 400,
                         epochs=args.epochs or 8, seed=args.seed,
                         kv_heads=args.kv_heads)
    metrics = train_demo_a(args.out, spec=spec)
    print(json.dumps(metrics))


def cmd_distill_emotion(args):
    from .emotion.train_scratch import ScratchSpec, distill_classifier

    spec = ScratchSpec(dim=args.dim, n_layers=args.n_layers,
                       hidden_dim=3 * args.dim, epochs=args.epochs,
                       seed=args.seed, n_per_label=args.n_per_label,
                       pool=args.pool, cue_suppress=args.cue_suppress,
                       pretrain_epochs=args.pretrain_epochs,
                       gen_per_label=args.gen_per_label)
    metrics = distill_classifier(args.out, spec=spec)
    # empty splits report nan; stdout must stay strict JSON (RFC 8259)
    import math

    print(json.dumps({k: (None if isinstance(v, float)
                          and not math.isfinite(v) else v)
                      for k, v in metrics.items()}))


def cmd_finetune_emotion(args):
    import pickle

    from .emotion.finetune import LoraSpec, finetune, load_label_tsv
    from .models.distilbert import DistilBertConfig, WordPieceTokenizer

    with open(f"{args.base}/config.pkl", "rb") as f:
        cfg = DistilBertConfig(**pickle.load(f))
    with open(f"{args.base}/params.pkl", "rb") as f:
        params = pickle.load(f)
    tok = WordPieceTokenizer(f"{args.base}/vocab.txt")
    texts, labels = load_label_tsv(args.tsv)
    spec = LoraSpec(r=args.r, alpha=args.alpha, lr=args.lr,
                    batch=args.batch, epochs=args.epochs, seed=args.seed)
    merged, _, history = finetune(params, cfg, tok, texts, labels,
                                  spec=spec, log_every=args.log_every)
    import os
    import shutil

    import jax
    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    with open(f"{args.out}/params.pkl", "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, merged), f)
    shutil.copy(f"{args.base}/config.pkl", f"{args.out}/config.pkl")
    shutil.copy(f"{args.base}/vocab.txt", f"{args.out}/vocab.txt")
    print(json.dumps({"final_loss": history[-1]["loss"],
                      "out": args.out}))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "serve":
        # argparse.REMAINDER mis-parses leading --flags; hand the rest to
        # the server's own parser directly
        from .serve.server import main as serve_main

        sys.argv = ["serve"] + argv[1:]
        return serve_main()

    p = argparse.ArgumentParser(
        prog="eamg_tpu", description="EAMG-TPU framework CLI",
        epilog="additional command: serve [--port N --coalesce ...] — "
               "HTTP server (dispatched to serve.server's own parser; "
               "`eamg serve --help` for its flags)")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a music generator")
    t.add_argument("--preset", default="large2",
                   choices=["mini", "large", "large2", "no_inst", "paper"])
    t.add_argument("--csv", default=None)
    t.add_argument("--synthetic", type=int, default=None,
                   help="rows of synthetic corpus instead of --csv")
    t.add_argument("--max-rows", type=int, default=None)
    t.add_argument("--out", default="ckpt_out")
    t.add_argument("--scheme", default=None,
                   choices=[None, "a", "b1", "b2", "b3"])
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--save-every", type=int, default=500)
    t.add_argument("--save-hours", type=float, default=None)
    t.add_argument("--mesh-data", type=int, default=1)
    t.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size (enables Megatron TP)")
    t.add_argument("--fsdp", action="store_true",
                   help="ZeRO/FSDP: shard params + optimizer state over "
                        "the data axis (needs --mesh-data > 1)")
    t.add_argument("--pack", action="store_true",
                   help="sequence packing: several whole songs per row "
                        "with block-diagonal attention + per-segment "
                        "positions (implies --corrected; short songs stop "
                        "wasting the row as PAD)")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (step + optimizer "
                        "state restored)")
    t.add_argument("--d-model", type=int, default=None,
                   help="override the preset's model width")
    t.add_argument("--n-head", type=int, default=None)
    t.add_argument("--n-layer", type=int, default=None)
    t.add_argument("--seq-len", type=int, default=None)
    t.add_argument("--attn-block", type=int, default=None,
                   help="blockwise online-softmax training attention "
                        "with this KV block size (VERDICT r4 #3; the "
                        "[B,H,T,T] score tensor never materializes)")
    t.add_argument("--experts", type=int, default=None,
                   help="mixture-of-experts FFN: number of routed experts "
                        "(beyond-reference; dense when omitted)")
    t.add_argument("--moe-every", type=int, default=1,
                   help="replace every k-th layer's MLP with experts")
    t.add_argument("--corrected", action="store_true",
                   help="train the corrected causal architecture (no "
                        "reference quirks; enables speculative decoding "
                        "and request coalescing)")
    t.set_defaults(fn=cmd_train)

    g = sub.add_parser("generate", help="generate MIDI (batch/interactive)")
    g.add_argument("--checkpoint", default=None)
    g.add_argument("--interactive", action="store_true")
    g.add_argument("--bpm", type=float, default=180)
    g.add_argument("--key", default="A minor")
    g.add_argument("--instruments", nargs="*",
                   default=["Violin", "Acoustic Grand Piano"])
    g.add_argument("--max-len", type=int, default=None)
    g.add_argument("--temperature", type=float, default=1.0)
    g.add_argument("--top-k", type=int, default=50)
    g.add_argument("--top-p", type=float, default=1.0,
                   help="nucleus sampling mass (1.0 = off; applied after "
                        "top-k, sort-free bitsearch — beyond-reference)")
    g.add_argument("--min-p", type=float, default=0.0,
                   help="min-p cutoff: drop tokens below min_p x the top "
                        "token's probability (0 = off; beyond-reference)")
    g.add_argument("--repetition-penalty", type=float, default=1.0,
                   help="CTRL/HF repetition penalty over already-seen "
                        "tokens (1.0 = off; >1 discourages repeats; "
                        "beyond-reference)")
    g.add_argument("--frequency-penalty", type=float, default=0.0,
                   help="subtract count x this from seen tokens' logits "
                        "(OpenAI semantics, 0 = off)")
    g.add_argument("--presence-penalty", type=float, default=0.0,
                   help="subtract this from every seen token's logit "
                        "(OpenAI semantics, 0 = off)")
    g.add_argument("--beams", type=int, default=0,
                   help="deterministic beam search with this many beams "
                        "instead of sampling (decode/beam.py); 0 = off")
    g.add_argument("--length-penalty", type=float, default=1.0,
                   help="beam ranking: score / gen_len**alpha (GNMT); "
                        "only with --beams")
    g.add_argument("--grammar", action="store_true",
                   help="FSM-constrained decoding: every sampled token "
                        "follows the scheme's surface grammar and the "
                        "stream closes with a complete note + END token "
                        "(decode/grammar.py)")
    g.add_argument("--no-repeat-ngram", type=int, default=0,
                   help="HF no_repeat_ngram_size: ban tokens completing "
                        "an n-gram already generated (0 = off; static — "
                        "each distinct n is one compiled program)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--out", default="generated.mid")
    g.add_argument("--wav", default=None)
    g.add_argument("--full-gm", action="store_true")
    g.add_argument("--draft", default=None,
                   help="draft-model checkpoint dir: enables speculative "
                        "decoding (same output distribution, lower latency "
                        "with an aligned draft)")
    g.add_argument("--gamma", type=int, default=4,
                   help="speculative proposals per verify step")
    g.add_argument("--lookup", action="store_true",
                   help="draft-free speculative decoding: propose "
                        "continuations from the stream's own history "
                        "(prompt-lookup n-gram speculation; exact output "
                        "distribution, wins on repetitive token streams)")
    g.add_argument("--lookup-ngram", type=int, default=3,
                   help="history n-gram length matched by --lookup")
    g.add_argument("--medusa", default=None,
                   help="medusa heads pickle (cli train-medusa): "
                        "multi-token decoding — gamma head proposals "
                        "verified in one block forward, exact output "
                        "distribution")
    g.set_defaults(fn=cmd_generate)

    se = sub.add_parser("section-eval",
                        help="per-section emotion-adaptivity obedience "
                             "over multi-emotion prompts "
                             "(tools/section_metrics.py)")
    se.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: packaged demo)")
    se.add_argument("--prompts", type=int, default=50)
    se.add_argument("--seed", type=int, default=0)
    se.set_defaults(fn=cmd_section_eval)

    fb = sub.add_parser("feed-bench",
                        help="host data-pipeline feed-rate proof at "
                             "corpus scale (tools/feed_bench.py)")
    fb.add_argument("--rows", type=int, default=100_000)
    fb.add_argument("--notes", type=int, default=126)
    fb.add_argument("--steps", type=int, default=200)
    fb.add_argument("--shards", type=int, default=16)
    fb.set_defaults(fn=cmd_feed_bench)

    ab = sub.add_parser("ablate",
                        help="paper §10.4 ablation table (PPL / MSE-Tune)")
    ab.add_argument("--csv", default=None,
                    help="real Lakh corpus CSV (paper scale); default: "
                         "synthetic tempo-locked corpus")
    ab.add_argument("--synthetic", type=int, default=384)
    ab.add_argument("--max-rows", type=int, default=None)
    ab.add_argument("--seq-len", type=int, default=96)
    ab.add_argument("--d-model", type=int, default=128)
    ab.add_argument("--n-head", type=int, default=4)
    ab.add_argument("--n-layer", type=int, default=2)
    ab.add_argument("--epochs", type=int, default=4)
    ab.add_argument("--seed", type=int, default=0)
    ab.add_argument("--jitter-ms", type=float, default=0.0,
                    help="Gaussian micro-timing on synthetic onsets "
                         "(performance-MIDI realism; see tools/ablation)")
    ab.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ab.add_argument("--out", default=None, help="write markdown table here")
    ab.set_defaults(fn=cmd_ablate)

    a = sub.add_parser("analyze", help="corpus key/instrument histograms")
    a.add_argument("--csv", required=True)
    a.add_argument("--max-rows", type=int, default=20_000)
    a.add_argument("--out", default="analysis_output.txt")
    a.set_defaults(fn=cmd_analyze)

    k = sub.add_parser("tokenize", help="MIDI dir -> corpus CSV")
    k.add_argument("--midi-dir", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--max-files", type=int, default=None)
    k.set_defaults(fn=cmd_tokenize)

    c = sub.add_parser("convert-pt", help="reference .pt -> checkpoint dir")
    c.add_argument("--pt", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--serving-arch", action="store_true",
                   help="build the api_cache pre-LN serving arch")
    c.set_defaults(fn=cmd_convert_pt)

    ep = sub.add_parser("export-pt",
                        help="checkpoint dir -> reference .pt (torch "
                             "format; the reverse of convert-pt)")
    ep.add_argument("--ckpt", required=True)
    ep.add_argument("--pt", required=True)
    ep.add_argument("--dialect", choices=("trainer", "kv"), default=None,
                    help="state-dict key naming: trainer (train_*.py / "
                         "api.py) or kv (api_cache.py remap output); "
                         "default follows the checkpoint's ln_placement "
                         "(post -> trainer, pre -> kv)")
    ep.set_defaults(fn=cmd_export_pt)

    q = sub.add_parser("convert-gqa",
                       help="MHA checkpoint dir -> GQA (mean-pooled K/V "
                            "heads; the measured decode-latency lever)")
    q.add_argument("--ckpt", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--kv-heads", type=int, required=True)
    q.set_defaults(fn=cmd_convert_gqa)

    gr = sub.add_parser("gqa-recover",
                        help="convert an MHA checkpoint to GQA, measure "
                             "the PPL cost, uptrain to recover it, and "
                             "time decode for both architectures")
    gr.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: the packaged B3 demo)")
    gr.add_argument("--out", default=None,
                    help="save the recovered GQA checkpoint here")
    gr.add_argument("--kv-heads", type=int, default=2)
    gr.add_argument("--rows", type=int, default=2000)
    gr.add_argument("--steps", type=int, default=200)
    gr.add_argument("--lr", type=float, default=1e-4)
    gr.add_argument("--seed", type=int, default=0)
    gr.set_defaults(fn=cmd_gqa_recover)

    md = sub.add_parser("train-medusa",
                        help="train Medusa heads on a frozen checkpoint "
                             "(batch-1 multi-token decoding) and "
                             "optionally measure the latency win")
    md.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: the packaged B3 demo)")
    md.add_argument("--out", required=True, help="heads pickle path")
    md.add_argument("--heads", type=int, default=4)
    md.add_argument("--rows", type=int, default=4000)
    md.add_argument("--epochs", type=int, default=4)
    md.add_argument("--batch", type=int, default=32)
    md.add_argument("--lr", type=float, default=1e-3)
    md.add_argument("--seed", type=int, default=0)
    md.add_argument("--measure", action="store_true",
                    help="time batch-1 plain vs medusa after training")
    md.add_argument("--max-len", dest="max_len", type=int, default=256)
    md.add_argument("--sample", action="store_true",
                    help="measure sampled (default greedy) decoding")
    md.set_defaults(fn=cmd_train_medusa)

    mm = sub.add_parser("medusa-measure",
                        help="interleaved A/B latency of plain vs "
                             "medusa (linear or --tree) on a trained "
                             "checkpoint's shipped heads")
    mm.add_argument("--ckpt", default=None)
    mm.add_argument("--heads", default=None,
                    help="default: <ckpt>/medusa_heads.pkl")
    mm.add_argument("--max-len", dest="max_len", type=int, default=256)
    mm.add_argument("--reps", type=int, default=5)
    mm.add_argument("--tree", action="store_true",
                    help="measure Medusa-2 tree verification (greedy)")
    mm.add_argument("--sample", action="store_true")
    mm.set_defaults(fn=cmd_medusa_measure)

    d = sub.add_parser("convert-distilbert",
                       help="HF snapshot dir -> emotion checkpoint dir")
    d.add_argument("--hf-dir", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--alpha", type=float, default=16.0)
    d.set_defaults(fn=cmd_convert_distilbert)

    e = sub.add_parser("emotion", help="classify text + EATS mapping demo")
    e.add_argument("--text", required=True)
    e.add_argument("--seed", type=int, default=None)
    e.set_defaults(fn=cmd_emotion)

    x = sub.add_parser("export-emotion-hf",
                       help="emotion ckpt dir -> HF snapshot (+ optional "
                            "Hub push)")
    x.add_argument("--ckpt", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--push", default=None, help="HF repo id to upload to")
    x.set_defaults(fn=cmd_export_emotion_hf)

    da = sub.add_parser("train-demo-a",
                        help="retrain the packaged Scheme-A demo on the "
                             "grid-quantized motif-reuse corpus "
                             "(generalization metrics in "
                             "train_metrics.json)")
    da.add_argument("--out", default="eamg_tpu/serve/demo_ckpt_a")
    da.add_argument("--rows", type=int, default=None,
                    help="default: 12000 compact / 24000 flagship")
    da.add_argument("--heldout-rows", type=int, default=None)
    da.add_argument("--epochs", type=int, default=None,
                    help="default: 8 compact / 24 flagship")
    da.add_argument("--seed", type=int, default=0)
    da.add_argument("--geometry", choices=["compact", "flagship"],
                    default="compact",
                    help="flagship = the reference product geometry "
                         "(d512 h8 L6 seq512, api_cache.py:36 + paper "
                         "Table 5) on ~480-token grid songs")
    da.add_argument("--kv-heads", type=int, default=None,
                    help="train GQA natively with this many K/V heads "
                         "(decode-latency lever, DESIGN §3.7; demos are "
                         "corrected-mode so parity permits it)")
    da.set_defaults(fn=cmd_train_demo_a)

    di = sub.add_parser("distill-emotion",
                        help="train the in-repo neural emotion classifier "
                             "from scratch (template distillation)")
    di.add_argument("--out", default="eamg_tpu/emotion/ckpt_distilbert")
    di.add_argument("--dim", type=int, default=256)
    di.add_argument("--n-layers", type=int, default=4)
    di.add_argument("--epochs", type=int, default=12)
    di.add_argument("--seed", type=int, default=2026)
    di.add_argument("--n-per-label", type=int, default=1200,
                    help="template rows per label (the shipped recipe; the\n                         {800,1200,1600} sweep peaked at 1200 — BENCHMARKS r5)")
    di.add_argument("--pool", default="max",
                    choices=["max", "cls", "mean"],
                    help="max = per-token cue-detector head (the shipped "
                         "recipe; +12pt OOD over cls)")
    di.add_argument("--cue-suppress", type=float, default=0.3,
                    help="span-supervision weight on non-cue tokens' "
                         "non-neutral logits (pool=max only)")
    di.add_argument("--gen-per-label", type=int, default=0,
                    help="compositional situation-generator TRAINING "
                         "rows per label (situation_gen). Default 0 — "
                         "the round-4 saturation study measured "
                         "generator training rows monotone-negative on "
                         "the frozen exam (BENCHMARKS.md). The frozen "
                         "exam is built regardless; eval_gen_schemas "
                         "is empty (metrics null) at 0")
    di.add_argument("--pretrain-epochs", type=int, default=0,
                    help="MLM-pretrain the trunk on the train split for "
                         "N epochs before classification (VERDICT r2 #2 "
                         "lever (a); 0 = off)")
    di.set_defaults(fn=cmd_distill_emotion)

    f = sub.add_parser("finetune-emotion",
                       help="LoRA-finetune the emotion classifier")
    f.add_argument("--base", required=True,
                   help="base emotion checkpoint dir")
    f.add_argument("--tsv", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--r", type=int, default=8)
    f.add_argument("--alpha", type=float, default=16.0)
    f.add_argument("--lr", type=float, default=5e-4)
    f.add_argument("--batch", type=int, default=16)
    f.add_argument("--epochs", type=int, default=3)
    f.add_argument("--seed", type=int, default=42)
    f.add_argument("--log-every", type=int, default=10)
    f.set_defaults(fn=cmd_finetune_emotion)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
