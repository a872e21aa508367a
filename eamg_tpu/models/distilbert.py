"""DistilBERT-for-sequence-classification in functional JAX, with LoRA.

Replaces the reference's torch/HF classifier (emotion_analysis/modeling.py:
8-25 loads DistilBERT + a PEFT LoRA adapter from the HF Hub at import time).
Here the model is a pure-JAX forward over torch-layout params; the LoRA
adapter (r=8, alpha=16, targets q_lin/v_lin — Scripts/finetuneDistillBert
.ipynb cell 8) is merged at load as ``W + (alpha/r)·B@A`` so serving costs
nothing extra; the HF/PEFT state-dict importer speaks the hub checkpoint's
key dialect so `SaiRohitMurali/distilbertmodel-598` can be converted offline.

Fixed-shape (pad-to-max_len) jitted forward: one compiled program serves
every prompt.
"""

from __future__ import annotations

import dataclasses
import math
import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    num_labels: int = 28
    pad_token_id: int = 0
    ln_eps: float = 1e-12
    # "cls" = HF DistilBertForSequenceClassification pooling (first token);
    # "mean" = masked mean over tokens — better inductive bias for the
    # from-scratch distilled classifier (emotion/train_scratch.py)
    pool: str = "cls"

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def _ln(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _lin(x, p):
    return x @ p["w"].T + p["b"]


def _lora_delta(x, lp, scale):
    """x @ (scale * B@A)^T computed low-rank: (x @ A^T) @ B^T * scale."""
    return (x @ lp["A"].T) @ lp["B"].T * scale


@partial(jax.jit, static_argnames=("cfg",))
def forward(params: dict, ids: jax.Array, attention_mask: jax.Array,
            cfg: DistilBertConfig, lora: dict | None = None,
            lora_scale: float = 2.0) -> jax.Array:
    """[B, T] ids + [B, T] 0/1 mask -> [B, num_labels] logits.

    lora: optional unmerged adapter {"layers": [{"q": {A, B}, "v": {A, B}},
    ...]} applied as low-rank deltas on q_lin/v_lin (the reference adapter's
    targets, Scripts/finetuneDistillBert.ipynb cell 8); lora_scale =
    alpha/r (16/8 = 2 for the reference recipe).
    """
    return _forward_impl(params, ids, attention_mask, cfg, lora,
                         lora_scale)


def forward_token_logits(params: dict, ids: jax.Array,
                         attention_mask: jax.Array,
                         cfg: DistilBertConfig) -> jax.Array:
    """[B, T, num_labels] PER-TOKEN label logits (pool='max' models only:
    the head before the masked max). The max-pool trainer's cue-span
    suppression loss reads these; ``forward`` == masked max over dim 1.
    NOT jitted — call inside your own jit (the trainer does)."""
    assert cfg.pool == "max"
    return _forward_impl(params, ids, attention_mask, cfg, None, 2.0,
                         token_logits=True)


def forward_hidden(params: dict, ids: jax.Array, attention_mask: jax.Array,
                   cfg: DistilBertConfig) -> jax.Array:
    """[B, T] ids + mask -> [B, T, dim] final-layer hidden states (the
    trunk without any classifier head). The MLM pretrainer
    (emotion/train_scratch.py) ties these back to ``word_emb`` for its
    masked-token logits. NOT jitted — call inside your own jit."""
    return _trunk(params, ids, attention_mask, cfg, None, 2.0)


def _trunk(params, ids, attention_mask, cfg, lora=None, lora_scale=2.0):
    B, T = ids.shape
    x = (params["word_emb"][ids]
         + params["pos_emb"][jnp.arange(T)][None])
    x = _ln(x, params["emb_ln"]["g"], params["emb_ln"]["b"], cfg.ln_eps)

    neg = jnp.finfo(x.dtype).min
    key_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    def heads(y):
        return y.reshape(B, T, cfg.n_heads, cfg.head_dim).transpose(
            0, 2, 1, 3)

    for li, p in enumerate(params["layers"]):
        lq = lora["layers"][li] if lora is not None else None
        q_full = _lin(x, p["q"]) + (_lora_delta(x, lq["q"], lora_scale)
                                    if lq else 0.0)
        v_full = _lin(x, p["v"]) + (_lora_delta(x, lq["v"], lora_scale)
                                    if lq else 0.0)
        q = heads(q_full) / math.sqrt(cfg.head_dim)
        k = heads(_lin(x, p["k"]))
        v = heads(v_full)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + key_mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, cfg.dim)
        x = _ln(x + _lin(ctx, p["out"]), p["sa_ln"]["g"], p["sa_ln"]["b"],
                cfg.ln_eps)
        h = jax.nn.gelu(_lin(x, p["lin1"]), approximate=False)
        x = _ln(x + _lin(h, p["lin2"]), p["out_ln"]["g"], p["out_ln"]["b"],
                cfg.ln_eps)
    return x


def _forward_impl(params, ids, attention_mask, cfg, lora=None,
                  lora_scale=2.0, token_logits=False):
    x = _trunk(params, ids, attention_mask, cfg, lora, lora_scale)

    if cfg.pool == "max":
        # cue-detector head: per-token label logits, masked max over
        # positions. Long noun-heavy contexts can't dilute a trained cue
        # phrase — the strongest token-local evidence wins regardless of
        # sentence length (the top OOD failure mode of CLS pooling:
        # "the contractor took our deposit and never showed, i am fuming"
        # drowned the cue in unseen content words).
        h = jax.nn.relu(_lin(x, params["pre_classifier"]))
        tok_logits = _lin(h, params["classifier"])          # [B, T, L]
        if token_logits:
            return tok_logits
        neg = jnp.finfo(tok_logits.dtype).min
        m = attention_mask[..., None] > 0
        return jnp.max(jnp.where(m, tok_logits, neg), axis=1)
    assert not token_logits, "token logits need pool='max'"
    if cfg.pool == "mean":
        w = attention_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0)
    else:
        pooled = x[:, 0]
    pooled = jax.nn.relu(_lin(pooled, params["pre_classifier"]))
    return _lin(pooled, params["classifier"])


# ----------------------------------------------------------------- import

def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _strip_prefixes(sd: dict) -> dict:
    """Drop PEFT wrappers: base_model.model., .base_layer, modules_to_save."""
    out = {}
    for k, v in sd.items():
        k = k.replace("base_model.model.", "")
        k = k.replace(".base_layer", "")
        k = k.replace(".modules_to_save.default", "")
        k = k.replace(".original_module", "")
        out[k] = v
    return out


def import_hf_state_dict(sd: dict, cfg: DistilBertConfig,
                         lora_alpha: float = 16.0) -> dict:
    """HF DistilBertForSequenceClassification state dict (optionally with
    PEFT LoRA keys) -> our param pytree, LoRA merged.

    Returns HOST (numpy) arrays deliberately: this runs inside
    torch-carrying converter subprocesses (tools/convert.py) where
    initializing a jax backend either deadlocks with torch (XLA:CPU,
    CLAUDE.md) or hangs dialing the TPU tunnel; consumers that compute
    feed the tree to jit, which device-puts on first use."""
    sd = _strip_prefixes(sd)

    def f32(name):
        return _np(sd[name]).astype(np.float32)

    def lin(name):
        w = f32(f"{name}.weight")
        b = f32(f"{name}.bias")
        la, lb = f"{name}.lora_A.default.weight", \
            f"{name}.lora_B.default.weight"
        if la in sd:
            A = f32(la)   # [r, in]
            Bm = f32(lb)  # [out, r]
            w = w + (lora_alpha / A.shape[0]) * (Bm @ A)
        return {"w": w, "b": b}

    layers = []
    for i in range(cfg.n_layers):
        pre = f"distilbert.transformer.layer.{i}"
        layers.append({
            "q": lin(f"{pre}.attention.q_lin"),
            "k": lin(f"{pre}.attention.k_lin"),
            "v": lin(f"{pre}.attention.v_lin"),
            "out": lin(f"{pre}.attention.out_lin"),
            "sa_ln": {"g": f32(f"{pre}.sa_layer_norm.weight"),
                      "b": f32(f"{pre}.sa_layer_norm.bias")},
            "lin1": lin(f"{pre}.ffn.lin1"),
            "lin2": lin(f"{pre}.ffn.lin2"),
            "out_ln": {"g": f32(f"{pre}.output_layer_norm.weight"),
                       "b": f32(f"{pre}.output_layer_norm.bias")},
        })
    return {
        "word_emb": f32("distilbert.embeddings.word_embeddings.weight"),
        "pos_emb": f32("distilbert.embeddings.position_embeddings.weight"),
        "emb_ln": {"g": f32("distilbert.embeddings.LayerNorm.weight"),
                   "b": f32("distilbert.embeddings.LayerNorm.bias")},
        "layers": layers,
        "pre_classifier": lin("pre_classifier"),
        "classifier": lin("classifier"),
    }


def init_params(rng: jax.Array, cfg: DistilBertConfig) -> dict:
    """Random init (N(0, 0.02) matmuls, unit LayerNorms) for tests/training
    from scratch."""
    keys = iter(jax.random.split(rng, 8 + 6 * cfg.n_layers))

    def lin(fan_out, fan_in):
        return {"w": 0.02 * jax.random.normal(next(keys), (fan_out, fan_in)),
                "b": jnp.zeros((fan_out,))}

    def ln(d):
        return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}

    D, FF = cfg.dim, cfg.hidden_dim
    layers = [{
        "q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "out": lin(D, D),
        "sa_ln": ln(D), "lin1": lin(FF, D), "lin2": lin(D, FF),
        "out_ln": ln(D),
    } for _ in range(cfg.n_layers)]
    return {
        "word_emb": 0.02 * jax.random.normal(
            next(keys), (cfg.vocab_size, D)),
        "pos_emb": 0.02 * jax.random.normal(
            next(keys), (cfg.max_position_embeddings, D)),
        "emb_ln": ln(D),
        "layers": layers,
        "pre_classifier": lin(D, D),
        "classifier": lin(cfg.num_labels, D),
    }


# ------------------------------------------------------------- tokenizer

class WordPieceTokenizer:
    """BERT-style WordPiece tokenizer (lowercasing + punctuation split +
    greedy longest-match subwords), self-contained — the reference pulls
    HF's tokenizer from the network (modeling.py:14)."""

    def __init__(self, vocab, unk="[UNK]", cls="[CLS]", sep="[SEP]",
                 pad="[PAD]", max_input_chars_per_word=100):
        if isinstance(vocab, (str, bytes)):
            with open(vocab, encoding="utf-8") as f:
                vocab = [line.rstrip("\n") for line in f]
        self.vocab = {t: i for i, t in enumerate(vocab)}
        self.unk, self.cls, self.sep, self.pad = unk, cls, sep, pad
        self.max_chars = max_input_chars_per_word

    @staticmethod
    def _basic(text: str) -> list[str]:
        text = text.lower()
        text = re.sub(r"\s+", " ", text).strip()
        out, buf = [], []
        for ch in text:
            if ch.isalnum():
                buf.append(ch)
            else:
                if buf:
                    out.append("".join(buf))
                    buf = []
                if not ch.isspace():
                    out.append(ch)
        if buf:
            out.append("".join(buf))
        return out

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_chars:
            return [self.unk]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out = []
        for word in self._basic(text):
            out.extend(self._wordpiece(word))
        return out

    def _random_split(self, word: str, rng) -> list[str]:
        """Decompose a whole-vocab word at a RANDOM valid stem boundary
        (stem + greedy ##pieces). Training-time subword regularization:
        stem-piece embeddings only receive gradient if train encodes
        sometimes route through them."""
        splits = [s for s in range(4, len(word))
                  if word[:s] in self.vocab]
        if not splits:
            return [word]
        s = splits[rng.randrange(len(splits))]
        stem, rest = word[:s], word[s:]
        pieces, start = [stem], 0
        while start < len(rest):
            end = len(rest)
            cur = None
            while start < end:
                sub = "##" + rest[start:end]
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [word]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize_dropout(self, text: str, rng, p: float = 0.1) -> list[str]:
        """tokenize() with BPE-dropout-style piece regularization: each
        in-vocab word is decomposed through a random stem split with
        probability p (rng: random.Random — host-side, deterministic)."""
        out = []
        for word in self._basic(text):
            if len(word) >= 5 and word in self.vocab and rng.random() < p:
                out.extend(self._random_split(word, rng))
            else:
                out.extend(self._wordpiece(word))
        return out

    def encode(self, text: str, max_length: int = 128, rng=None,
               piece_dropout: float = 0.0, cue: str | None = None) -> dict:
        """-> {"input_ids": [T], "attention_mask": [T][, "cue_mask"]}
        padded to max_length, truncated with [CLS]/[SEP] preserved. rng +
        piece_dropout > 0 enables training-time subword regularization.
        ``cue`` (a space-separated word span) adds a per-token 0/1
        "cue_mask" marking the pieces of cue words — the span supervision
        the max-pool trainer uses to suppress spurious context spikes."""
        if cue is None:
            toks = (self.tokenize_dropout(text, rng, piece_dropout)
                    if rng is not None and piece_dropout > 0
                    else self.tokenize(text))[:max_length - 2]
            flags = None
        else:
            protected = {w for cw in cue.split()
                         for w in self._basic(cw)}
            toks, flags = [], []
            for word in self._basic(text):
                if rng is not None and piece_dropout > 0 \
                        and len(word) >= 5 and word in self.vocab \
                        and rng.random() < piece_dropout:
                    pieces = self._random_split(word, rng)
                else:
                    pieces = self._wordpiece(word)
                toks.extend(pieces)
                flags.extend([word in protected] * len(pieces))
            toks = toks[:max_length - 2]
            flags = [False] + flags[:max_length - 2] + [False]
        toks = [self.cls] + toks + [self.sep]
        ids = [self.vocab.get(t, self.vocab.get(self.unk, 0)) for t in toks]
        mask = [1] * len(ids)
        pad_id = self.vocab.get(self.pad, 0)
        while len(ids) < max_length:
            ids.append(pad_id)
            mask.append(0)
        out = {"input_ids": np.asarray(ids, np.int32),
               "attention_mask": np.asarray(mask, np.int32)}
        if flags is not None:
            flags = flags + [False] * (max_length - len(flags))
            out["cue_mask"] = np.asarray(flags[:max_length], np.int32)
        return out
