"""LoRA finetuning of the emotion classifier, in JAX.

Re-implements the reference's training notebook
(Scripts/finetuneDistillBert.ipynb) TPU-natively: LoRA adapters (r=8,
alpha=16, dropout 0.1, targets q_lin/v_lin — cell 8) plus the
classification heads are the only trainable leaves; the DistilBERT trunk is
frozen. HF Trainer's recipe (AdamW lr 5e-4, weight decay 0.01, batch 16,
3 epochs, seed 42 — cells 7/9) is the default TrainSpec.

GoEmotions itself can't be fetched in a zero-egress environment; data comes
from a local file (``load_label_tsv``: "text<TAB>label_id") or any
(texts, labels) pair. For multi-label GoEmotions rows the reference kept
only the first label (cell 3) — ``first_label`` mirrors that.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import distilbert as db


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.1          # applied to the LoRA input during training
    lr: float = 5e-4
    weight_decay: float = 0.01
    batch: int = 16
    epochs: int = 3
    seed: int = 42
    max_length: int = 128

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora(rng: jax.Array, cfg: db.DistilBertConfig,
              spec: LoraSpec) -> dict:
    """PEFT-style init: A ~ kaiming-uniform, B = zeros (adapter starts as
    the identity)."""
    layers = []
    keys = jax.random.split(rng, cfg.n_layers * 2)
    bound = math.sqrt(6.0 / cfg.dim)  # kaiming-uniform a=sqrt(5) on [r, dim]
    for i in range(cfg.n_layers):
        layers.append({
            "q": {"A": jax.random.uniform(keys[2 * i], (spec.r, cfg.dim),
                                          jnp.float32, -bound, bound),
                  "B": jnp.zeros((cfg.dim, spec.r))},
            "v": {"A": jax.random.uniform(keys[2 * i + 1],
                                          (spec.r, cfg.dim),
                                          jnp.float32, -bound, bound),
                  "B": jnp.zeros((cfg.dim, spec.r))},
        })
    return {"layers": layers}


def merge_lora(params: dict, lora: dict, spec: LoraSpec) -> dict:
    """W + (alpha/r) B@A folded into the base weights (serving form —
    models/distilbert.py merges the same way when importing PEFT
    checkpoints)."""
    merged = jax.tree.map(lambda x: x, params)  # shallow copy of leaves
    layers = []
    for p, lp in zip(params["layers"], lora["layers"]):
        p2 = dict(p)
        p2["q"] = {"w": p["q"]["w"] + spec.scale * lp["q"]["B"] @
                   lp["q"]["A"], "b": p["q"]["b"]}
        p2["v"] = {"w": p["v"]["w"] + spec.scale * lp["v"]["B"] @
                   lp["v"]["A"], "b": p["v"]["b"]}
        layers.append(p2)
    merged["layers"] = layers
    return merged


def make_finetune_step(cfg: db.DistilBertConfig, spec: LoraSpec,
                       optimizer=None):
    """Returns (step, optimizer): step(trainable, frozen, opt_state, ids,
    mask, labels, rng) -> (trainable, opt_state, metrics). ``trainable`` =
    {"lora", "pre_classifier", "classifier"} (PEFT SEQ_CLS saves the heads
    too); everything else frozen."""
    optimizer = optimizer or optax.adamw(
        spec.lr, weight_decay=spec.weight_decay)

    def apply(trainable, frozen, ids, mask):
        params = dict(frozen)
        params["pre_classifier"] = trainable["pre_classifier"]
        params["classifier"] = trainable["classifier"]
        return db.forward(params, ids, mask, cfg, lora=trainable["lora"],
                          lora_scale=spec.scale)

    def loss_fn(trainable, frozen, ids, mask, labels):
        logits = apply(trainable, frozen, ids, mask)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return jnp.mean(nll), acc

    @jax.jit
    def step(trainable, frozen, opt_state, ids, mask, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, ids, mask, labels)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, "accuracy": acc}

    return step, optimizer


def finetune(params: dict, cfg: db.DistilBertConfig, tokenizer,
             texts: list[str], labels: list[int],
             spec: LoraSpec = LoraSpec(), eval_fraction: float = 0.0,
             log_every: int = 0, log_fn=print):
    """Full finetune loop. Returns (merged_params, lora, history)."""
    rng = np.random.default_rng(spec.seed)
    enc = [tokenizer.encode(t, spec.max_length) for t in texts]
    ids = np.stack([e["input_ids"] for e in enc])
    mask = np.stack([e["attention_mask"] for e in enc])
    labels = np.asarray(labels, np.int32)

    n_eval = int(len(texts) * eval_fraction)
    order = rng.permutation(len(texts))
    eval_idx, train_idx = order[:n_eval], order[n_eval:]

    trainable = {
        "lora": init_lora(jax.random.PRNGKey(spec.seed), cfg, spec),
        "pre_classifier": params["pre_classifier"],
        "classifier": params["classifier"],
    }
    step, optimizer = make_finetune_step(cfg, spec)
    opt_state = optimizer.init(trainable)

    def evaluate(trainable):
        """Eval loss/accuracy over the held-out split (whole-set batch;
        mirrors the notebook's per-epoch eval, cell 9)."""
        import jax

        sel = eval_idx
        logits = db.forward(
            {**params, "pre_classifier": trainable["pre_classifier"],
             "classifier": trainable["classifier"]},
            jnp.asarray(ids[sel]), jnp.asarray(mask[sel]), cfg,
            lora=trainable["lora"], lora_scale=spec.scale)
        logp = jax.nn.log_softmax(logits, axis=-1)
        lbl = jnp.asarray(labels[sel])
        nll = -jnp.take_along_axis(logp, lbl[:, None], axis=1)[:, 0]
        return {"eval_loss": float(jnp.mean(nll)),
                "eval_accuracy": float(jnp.mean(
                    jnp.argmax(logits, -1) == lbl))}

    history = []
    it = 0
    for epoch in range(spec.epochs):
        rng.shuffle(train_idx)
        for s in range(0, len(train_idx) - spec.batch + 1, spec.batch):
            sel = train_idx[s:s + spec.batch]
            trainable, opt_state, m = step(
                trainable, params, opt_state, jnp.asarray(ids[sel]),
                jnp.asarray(mask[sel]), jnp.asarray(labels[sel]))
            it += 1
            if log_every and it % log_every == 0:
                log_fn(f"epoch {epoch + 1} step {it}: "
                       f"loss={float(m['loss']):.4f} "
                       f"acc={float(m['accuracy']):.3f}")
            history.append({k: float(v) for k, v in m.items()})
        if n_eval:
            ev = evaluate(trainable)
            history.append(ev)
            if log_every:
                log_fn(f"epoch {epoch + 1}: eval_loss="
                       f"{ev['eval_loss']:.4f} "
                       f"eval_acc={ev['eval_accuracy']:.3f}")

    merged = merge_lora(params, trainable["lora"], spec)
    merged["pre_classifier"] = trainable["pre_classifier"]
    merged["classifier"] = trainable["classifier"]
    return merged, trainable, history


def first_label(labels) -> int:
    """Multi-label GoEmotions row -> first label (notebook cell 3)."""
    if isinstance(labels, (list, tuple, np.ndarray)):
        return int(labels[0])
    return int(labels)


def load_label_tsv(path: str) -> tuple[list[str], list[int]]:
    """'text<TAB>label_id[,label_id...]' rows (the GoEmotions raw format)."""
    texts, labels = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            texts.append(parts[0])
            labels.append(first_label(parts[1].split(",")))
    return texts, labels
