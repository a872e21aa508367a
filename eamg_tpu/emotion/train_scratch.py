"""Train the product-path neural emotion classifier from scratch.

The reference serves a LoRA-finetuned pretrained DistilBERT pulled from the
HF Hub (emotion_analysis/modeling.py:8-25). With no network and no
pretrained weights available, this trains the same architecture family
(models/distilbert.py, compact geometry) from random init on the
template-distillation corpus (emotion/distill_data.py) and ships the
checkpoint in-repo, so the live pipeline classifies with a real on-device
neural forward instead of the keyword lexicon. The LoRA finetuner
(emotion/finetune.py) remains the reference-recipe path for when real
GoEmotions data / pretrained weights are present.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import pickle
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import distilbert as db
from .config import ID2LABEL
from .distill_data import OOD_EVAL, build_wordpiece_vocab, make_corpus, \
    tokenizer_corpus
from .lexicon import predict_label as lexicon_predict


@dataclasses.dataclass(frozen=True)
class ScratchSpec:
    dim: int = 192
    n_layers: int = 3
    n_heads: int = 4
    hidden_dim: int = 512
    max_length: int = 64
    lr: float = 3e-4
    weight_decay: float = 0.01
    batch: int = 64
    epochs: int = 12
    seed: int = 42
    n_per_label: int = 1200  # rows/label; {800,1200,1600} swept, 1200
                             # is the hump (BENCHMARKS r5)
    label_smoothing: float = 0.05
    pool: str = "cls"
    piece_dropout: float = 0.15  # P(word -> random stem split) in training
    # Cue-span suppression (pool="max" only): weight of the auxiliary
    # penalty on NON-cue tokens' positive non-neutral logits. The corpus
    # knows each example's cue span by construction (distill_data
    # train_cues); untrained context words at eval time can then no
    # longer spike a spurious label through the max — the top remaining
    # OOD failure mode of the plain max-pool model. 0 disables.
    cue_suppress: float = 0.0
    # Self-supervised MLM pretraining of the trunk before classification
    # (VERDICT r2 #2 lever (a): the mechanism behind the reference's
    # pretrained-DistilBERT advantage, emotion_analysis/modeling.py:15-18).
    # Pretrains on the classification TRAIN split only — held-out
    # templates/forms/situations stay unseen, so the eval splits are not
    # contaminated. 0 disables (the shipped default; see BENCHMARKS.md).
    pretrain_epochs: int = 0
    mask_prob: float = 0.15
    # Compositional situation-generator rows per label (situation_gen;
    # VERDICT r3 #2). The round-4 saturation study (BENCHMARKS.md)
    # measured generator TRAINING rows as monotone-negative on the
    # frozen exam (surface multiplication displaces frame abstraction),
    # so the shipped recipe trains with 0; the generator still builds
    # the eval splits + frozen exam. None = n_per_label // 2 (the
    # study's default mixing ratio), kept for the curve's midpoints.
    gen_per_label: int | None = 0


def _encode_all(tok, texts, max_length, rng=None, piece_dropout=0.0,
                cues=None):
    enc = [tok.encode(t, max_length, rng=rng, piece_dropout=piece_dropout,
                      cue=cues[i] if cues is not None else None)
           for i, t in enumerate(texts)]
    out = (np.stack([e["input_ids"] for e in enc]),
           np.stack([e["attention_mask"] for e in enc]))
    if cues is not None:
        return out + (np.stack([e["cue_mask"] for e in enc]),)
    return out


def _accuracy(params, cfg, tok, texts, labels, max_length, batch=256,
              top_k=1):
    if not texts:     # e.g. eval_gen_schemas with gen_per_label=0
        return float("nan")
    ids, mask = _encode_all(tok, texts, max_length)
    hits = 0
    for s in range(0, len(texts), batch):
        logits = db.forward(params, jnp.asarray(ids[s:s + batch]),
                            jnp.asarray(mask[s:s + batch]), cfg)
        y = jnp.asarray(labels[s:s + batch])
        if top_k == 1:
            hits += int(jnp.sum(jnp.argmax(logits, -1) == y))
        else:
            _, idx = jax.lax.top_k(logits, top_k)
            hits += int(jnp.sum(jnp.any(idx == y[:, None], axis=-1)))
    return hits / max(len(texts), 1)


def _lexicon_accuracy(texts, labels):
    return sum(lexicon_predict(t) == ID2LABEL[l]
               for t, l in zip(texts, labels)) / max(len(texts), 1)


def mlm_pretrain(params, cfg, tok, texts, spec: ScratchSpec,
                 log_fn=print):
    """BERT-style masked-language-model pretraining of the trunk.

    Masks ``spec.mask_prob`` of real tokens per sentence (80% -> [MASK],
    10% -> random id, 10% kept), predicts them through the tied embedding
    (hidden @ word_emb.T — no extra head params, so the returned tree has
    the same structure the classifier trainer expects). Corruption is
    drawn host-side per epoch, like the encoder's piece dropout."""
    import random as _random

    mask_id = tok.vocab["[MASK]"]
    special = np.zeros(cfg.vocab_size, bool)
    for t in ("[PAD]", "[CLS]", "[SEP]", "[MASK]", "[UNK]"):
        special[tok.vocab[t]] = True

    total_steps = max(spec.pretrain_epochs * (len(texts) // spec.batch), 2)
    optimizer = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, spec.lr, warmup_steps=max(1, min(200, total_steps // 10)),
            decay_steps=total_steps),
        weight_decay=spec.weight_decay)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, ids, mask, targets, loss_mask):
        def loss_fn(p):
            h = db.forward_hidden(p, ids, mask, cfg)       # [B, T, D]
            logits = h @ p["word_emb"].T                   # [B, T, V] tied
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * loss_mask) / jnp.maximum(
                jnp.sum(loss_mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(spec.seed + 7)
    enc_rng = _random.Random(spec.seed + 8)
    n = len(texts)
    loss = 0.0
    for epoch in range(spec.pretrain_epochs):
        ids_all, mask_all = _encode_all(
            tok, texts, spec.max_length, rng=enc_rng,
            piece_dropout=spec.piece_dropout)
        maskable = (mask_all > 0) & ~special[ids_all]
        u = rng.random(ids_all.shape)
        chosen = maskable & (u < spec.mask_prob)
        v = rng.random(ids_all.shape)
        corrupted = np.where(
            chosen & (v < 0.8), mask_id,
            np.where(chosen & (v >= 0.9),
                     rng.integers(0, cfg.vocab_size, ids_all.shape),
                     ids_all)).astype(np.int32)
        order = rng.permutation(n)
        for s in range(0, n - spec.batch + 1, spec.batch):
            sel = order[s:s + spec.batch]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(corrupted[sel]),
                jnp.asarray(mask_all[sel]), jnp.asarray(ids_all[sel]),
                jnp.asarray(chosen[sel].astype(np.float32)))
        log_fn(f"[mlm] epoch {epoch + 1}/{spec.pretrain_epochs}: "
               f"masked_nll={float(loss):.4f}")
    return params


def distill_classifier(out_dir: str, spec: ScratchSpec = ScratchSpec(),
                       log_fn=print) -> dict:
    """Generate corpus, train, evaluate vs the lexicon, save checkpoint dir
    ({params.pkl (f16), config.pkl, vocab.txt, metrics.json})."""
    t_start = time.time()
    data = make_corpus(n_per_label=spec.n_per_label, seed=spec.seed,
                       gen_per_label=spec.gen_per_label)
    train_x, train_y = data["train"]
    vocab = build_wordpiece_vocab(tokenizer_corpus(train_x))
    tok = db.WordPieceTokenizer(vocab)
    cfg = db.DistilBertConfig(
        vocab_size=len(vocab), max_position_embeddings=spec.max_length,
        dim=spec.dim, n_layers=spec.n_layers, n_heads=spec.n_heads,
        hidden_dim=spec.hidden_dim, num_labels=len(ID2LABEL),
        pool=spec.pool)
    log_fn(f"[distill] corpus {len(train_x)} train / "
           f"{len(data['eval'][0])} eval, vocab {len(vocab)}, "
           f"model d{cfg.dim} L{cfg.n_layers}")

    params = db.init_params(jax.random.PRNGKey(spec.seed), cfg)
    if spec.pretrain_epochs > 0:
        params = mlm_pretrain(params, cfg, tok, train_x, spec,
                              log_fn=log_fn)
    steps_per_epoch = max(len(train_x) // spec.batch, 1)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, spec.lr, warmup_steps=steps_per_epoch,
        decay_steps=spec.epochs * steps_per_epoch)
    optimizer = optax.adamw(schedule, weight_decay=spec.weight_decay)
    opt_state = optimizer.init(params)

    suppress = spec.cue_suppress if spec.pool == "max" else 0.0
    neutral_id = {v: k for k, v in ID2LABEL.items()}["neutral"]

    @jax.jit
    def step(params, opt_state, ids, mask, labels, cue_mask):
        def loss_fn(p):
            if suppress:
                tok = db.forward_token_logits(p, ids, mask, cfg)
                neg = jnp.finfo(tok.dtype).min
                logits = jnp.max(
                    jnp.where(mask[..., None] > 0, tok, neg), axis=1)
            else:
                logits = db.forward(p, ids, mask, cfg)
            logp = jax.nn.log_softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(labels, cfg.num_labels)
            sm = spec.label_smoothing
            target = onehot * (1 - sm) + sm / cfg.num_labels
            loss = -jnp.mean(jnp.sum(target * logp, axis=-1))
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            if suppress:
                # non-cue, non-pad tokens must not spike any non-neutral
                # label: squared hinge on their positive logits. Neutral
                # is exempt (cue-free sentences ARE neutral evidence).
                non_cue = (mask > 0) & (cue_mask == 0)
                cls_w = jnp.ones((cfg.num_labels,)).at[neutral_id].set(0.0)
                pen = jnp.square(jax.nn.relu(tok)) * cls_w
                pen = jnp.sum(pen * non_cue[..., None]) / \
                    jnp.maximum(jnp.sum(non_cue), 1)
                loss = loss + suppress * pen
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    import random as _random

    labels = np.asarray(train_y, np.int32)
    rng = np.random.default_rng(spec.seed)
    enc_rng = _random.Random(spec.seed + 1)
    n = len(train_x)
    # pad the tail batch so one compiled program covers every step
    loss = acc = 0.0
    cues = data.get("train_cues") if suppress else None
    for epoch in range(spec.epochs):
        # re-encode each epoch: piece_dropout re-samples stem splits, so
        # stem-piece embeddings see many (stem, ##suffix) routings
        enc = _encode_all(tok, train_x, spec.max_length, rng=enc_rng,
                          piece_dropout=spec.piece_dropout, cues=cues)
        ids, mask = enc[0], enc[1]
        cue_m = enc[2] if cues is not None else np.zeros_like(mask)
        order = rng.permutation(n)
        for s in range(0, n - spec.batch + 1, spec.batch):
            sel = order[s:s + spec.batch]
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(ids[sel]),
                jnp.asarray(mask[sel]), jnp.asarray(labels[sel]),
                jnp.asarray(cue_m[sel]))
        ev = _accuracy(params, cfg, tok, *data["eval"], spec.max_length)
        log_fn(f"[distill] epoch {epoch + 1}/{spec.epochs}: "
               f"train_loss={float(loss):.4f} "
               f"train_acc={float(acc):.3f} eval_acc={ev:.3f}")

    metrics = {
        "train_seconds": round(time.time() - t_start, 1),
        "eval_acc_distilbert": _accuracy(params, cfg, tok, *data["eval"],
                                         spec.max_length),
        "eval_acc_lexicon": _lexicon_accuracy(*data["eval"]),
        "unseen_forms_acc_distilbert": _accuracy(
            params, cfg, tok, *data["eval_unseen_forms"], spec.max_length),
        "unseen_forms_acc_lexicon": _lexicon_accuracy(
            *data["eval_unseen_forms"]),
        "ood_acc_distilbert": _accuracy(params, cfg, tok, *data["ood"],
                                        spec.max_length),
        # many OOD misses are sibling emotions (sadness/grief, anger/
        # annoyance); top-3 shows how often the gold label is in the
        # model's short list, which is what the EATS mapping consumes
        "ood_top3_distilbert": _accuracy(params, cfg, tok, *data["ood"],
                                         spec.max_length, top_k=3),
        "ood_acc_lexicon": _lexicon_accuracy(*data["ood"]),
        # the round-2 56-sentence OOD metric (OOD_EVAL alone) — kept so
        # the VERDICT r2 #2 floor (>= 0.70) stays comparable across ships
        "ood_acc_56_r2_metric": round(_accuracy(
            params, cfg, tok, data["ood"][0][:len(OOD_EVAL)],
            data["ood"][1][:len(OOD_EVAL)], spec.max_length), 4),
        "ood_top3_56_r2_metric": round(_accuracy(
            params, cfg, tok, data["ood"][0][:len(OOD_EVAL)],
            data["ood"][1][:len(OOD_EVAL)], spec.max_length, top_k=3), 4),
        # held-out situation TEMPLATES (same banks, unseen scenarios):
        # measures situation->emotion generalization one step before the
        # hand-written implicit tier below
        "eval_situations_acc": _accuracy(
            params, cfg, tok, *data["eval_situations"], spec.max_length),
        "eval_situations_lexicon": _lexicon_accuracy(
            *data["eval_situations"]),
        # held-out GENERATOR schemas (unseen event frame x unseen
        # consequence clause; situation_gen.split_schemas) — fresh draw
        # per seed, the regenerable cousin of the frozen exam
        "eval_gen_schemas_acc": _accuracy(
            params, cfg, tok, *data["eval_gen_schemas"],
            spec.max_length),
        # the committed 168-sentence frozen exam (hash-pinned): the
        # longitudinally comparable schema-abstraction number
        "frozen_exam_acc": _accuracy(
            params, cfg, tok, *data["frozen_exam"], spec.max_length),
        "frozen_exam_top3": _accuracy(
            params, cfg, tok, *data["frozen_exam"], spec.max_length,
            top_k=3),
        "frozen_exam_lexicon": _lexicon_accuracy(*data["frozen_exam"]),
        # situation-only sentences, no feeling words: the pretrained-LM
        # frontier (distill_data.OOD_IMPLICIT) — honest separate metric
        "ood_implicit_acc": _accuracy(
            params, cfg, tok, *data["ood_implicit"], spec.max_length),
        "ood_implicit_top3": _accuracy(
            params, cfg, tok, *data["ood_implicit"], spec.max_length,
            top_k=3),
        "n_train": n, "vocab_size": len(vocab),
        "pretrain_epochs": spec.pretrain_epochs,
        "params": int(sum(np.prod(x.shape)
                          for x in jax.tree.leaves(params))),
    }

    os.makedirs(out_dir, exist_ok=True)
    params_np = jax.tree.map(
        lambda x: np.asarray(x, np.float16), params)
    with open(os.path.join(out_dir, "params.pkl"), "wb") as f:
        pickle.dump(params_np, f)
    with open(os.path.join(out_dir, "config.pkl"), "wb") as f:
        pickle.dump(dataclasses.asdict(cfg), f)
    with open(os.path.join(out_dir, "vocab.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    # RFC 8259 has no NaN/Infinity literal: empty eval splits (e.g.
    # eval_gen_schemas at gen_per_label=0) report float('nan'), which
    # json.dump would serialize bare and break strict consumers (jq,
    # JSON.parse). Write null instead; keep the in-memory dict as-is.
    metrics_json = {k: (None if isinstance(v, float) and not math.isfinite(v)
                        else v)
                    for k, v in metrics.items()}
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics_json, f, indent=1, allow_nan=False)
        f.write("\n")
    log_fn(f"[distill] saved -> {out_dir}: {json.dumps(metrics)}")
    return metrics
