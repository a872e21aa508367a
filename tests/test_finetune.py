"""LoRA finetune tests: identity at init, merge equivalence, learning on a
separable toy task, frozen-trunk invariant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.emotion.finetune import (LoraSpec, finetune, first_label,
                                       init_lora, load_label_tsv,
                                       make_finetune_step, merge_lora)
from eamg_tpu.models import distilbert as db

CFG = db.DistilBertConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                          hidden_dim=64, max_position_embeddings=32,
                          num_labels=4)
SPEC = LoraSpec(r=4, alpha=8.0, batch=8, epochs=2, lr=5e-3, seed=0,
                max_length=12)


class ToyTokenizer:
    """Token id = hash bucket of each word; deterministic, vocab 64."""

    def encode(self, text, max_length):
        ids = [1] + [2 + (hash(w) % 60) for w in text.split()][:max_length
                                                               - 2] + [3]
        mask = [1] * len(ids)
        ids += [0] * (max_length - len(ids))
        mask += [0] * (max_length - len(mask))
        return {"input_ids": np.asarray(ids, np.int32),
                "attention_mask": np.asarray(mask, np.int32)}


def test_lora_identity_at_init():
    """B=0 init: adapter must not change logits."""
    params = db.init_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, SPEC)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    a = db.forward(params, ids, mask, CFG)
    b = db.forward(params, ids, mask, CFG, lora=lora,
                   lora_scale=SPEC.scale)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_merge_equals_unmerged():
    params = db.init_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, SPEC)
    # randomize B so the adapter is active
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                               x.shape), lora)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    unmerged = db.forward(params, ids, mask, CFG, lora=lora,
                          lora_scale=SPEC.scale)
    merged = db.forward(merge_lora(params, lora, SPEC), ids, mask, CFG)
    np.testing.assert_allclose(np.asarray(unmerged), np.asarray(merged),
                               atol=1e-4, rtol=1e-4)


def make_toy_data(n=64):
    """4-way separable task keyed on a marker word."""
    words = {0: "alpha", 1: "bravo", 2: "charlie", 3: "delta"}
    rng = np.random.default_rng(0)
    texts, labels = [], []
    for i in range(n):
        lab = i % 4
        filler = " ".join(rng.choice(["the", "of", "and", "to"], 3))
        texts.append(f"{filler} {words[lab]}")
        labels.append(lab)
    return texts, labels


def test_finetune_learns_toy_task():
    params = db.init_params(jax.random.PRNGKey(3), CFG)
    texts, labels = make_toy_data(64)
    merged, trainable, history = finetune(
        params, CFG, ToyTokenizer(), texts, labels,
        spec=LoraSpec(r=4, alpha=8.0, batch=16, epochs=30, lr=5e-3,
                      seed=0, max_length=12))
    assert history[-1]["loss"] < history[0]["loss"] * 0.7
    # merged model classifies the training data well above chance
    tok = ToyTokenizer()
    enc = [tok.encode(t, 12) for t in texts]
    ids = jnp.asarray(np.stack([e["input_ids"] for e in enc]))
    mask = jnp.asarray(np.stack([e["attention_mask"] for e in enc]))
    preds = np.asarray(jnp.argmax(db.forward(merged, ids, mask, CFG), -1))
    assert (preds == np.asarray(labels)).mean() > 0.6


def test_trunk_stays_frozen():
    params = db.init_params(jax.random.PRNGKey(4), CFG)
    before = np.asarray(params["layers"][0]["k"]["w"]).copy()
    texts, labels = make_toy_data(32)
    finetune(params, CFG, ToyTokenizer(), texts, labels,
             spec=LoraSpec(r=4, alpha=8.0, batch=16, epochs=1, seed=0,
                           max_length=12))
    np.testing.assert_array_equal(
        before, np.asarray(params["layers"][0]["k"]["w"]))


def test_first_label_and_tsv(tmp_path):
    assert first_label([3, 7]) == 3
    assert first_label(5) == 5
    p = tmp_path / "data.tsv"
    p.write_text("i am happy\t17,26\nso sad\t25\n")
    texts, labels = load_label_tsv(str(p))
    assert texts == ["i am happy", "so sad"]
    assert labels == [17, 25]


def test_finetune_eval_split():
    params = db.init_params(jax.random.PRNGKey(5), CFG)
    texts, labels = make_toy_data(64)
    _, _, history = finetune(
        params, CFG, ToyTokenizer(), texts, labels,
        spec=LoraSpec(r=4, alpha=8.0, batch=16, epochs=2, lr=5e-3, seed=0,
                      max_length=12), eval_fraction=0.25)
    evals = [h for h in history if "eval_loss" in h]
    assert len(evals) == 2  # one per epoch
    assert all(0.0 <= e["eval_accuracy"] <= 1.0 for e in evals)
