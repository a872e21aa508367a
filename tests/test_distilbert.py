"""DistilBERT parity: our functional JAX model + WordPiece tokenizer vs the
HF transformers/PEFT oracle (subprocess)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.models.distilbert import (DistilBertConfig, WordPieceTokenizer,
                                        forward, import_hf_state_dict,
                                        init_params)

jax.config.update("jax_default_matmul_precision", "highest")

TEXTS = ["I am so happy today!", "terrified of the dark",
         "I love music, and it is happy.", "don't", "unknownword happy"]

CFG = DistilBertConfig(vocab_size=100, dim=64, n_layers=2, n_heads=4,
                       hidden_dim=128, max_position_embeddings=64,
                       num_labels=28)


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    d = tmp_path_factory.mktemp("db_oracle")
    path, vocab = d / "oracle.npz", d / "vocab.txt"
    script = Path(__file__).parent / "distilbert_oracle.py"
    subprocess.run([sys.executable, str(script), str(path), str(vocab)],
                   check=True, timeout=600)
    return np.load(path), vocab


def sd(oracle, prefix):
    data = oracle[0]
    plen = len(prefix) + 2
    return {k[plen:]: data[k] for k in data.files
            if k.startswith(prefix + "::")}


def test_base_forward_parity(oracle):
    data, _ = oracle
    params = import_hf_state_dict(sd(oracle, "base"), CFG)
    got = np.asarray(forward(params, jnp.asarray(data["ids"]),
                             jnp.asarray(data["mask"]), CFG))
    np.testing.assert_allclose(got, data["logits_base"], atol=2e-4,
                               rtol=2e-4)


def test_lora_merged_forward_parity(oracle):
    data, _ = oracle
    params = import_hf_state_dict(sd(oracle, "peft"), CFG, lora_alpha=16.0)
    got = np.asarray(forward(params, jnp.asarray(data["ids"]),
                             jnp.asarray(data["mask"]), CFG))
    np.testing.assert_allclose(got, data["logits_lora"], atol=2e-4,
                               rtol=2e-4)


def test_lora_changes_logits(oracle):
    data, _ = oracle
    base = import_hf_state_dict(sd(oracle, "base"), CFG)
    lora = import_hf_state_dict(sd(oracle, "peft"), CFG, lora_alpha=16.0)
    a = np.asarray(forward(base, jnp.asarray(data["ids"]),
                           jnp.asarray(data["mask"]), CFG))
    b = np.asarray(forward(lora, jnp.asarray(data["ids"]),
                           jnp.asarray(data["mask"]), CFG))
    assert np.abs(a - b).max() > 1e-4


def test_padding_mask_isolation(oracle):
    """Logits must not depend on content of masked-out positions."""
    data, _ = oracle
    params = import_hf_state_dict(sd(oracle, "base"), CFG)
    ids = np.asarray(data["ids"]).copy()
    mask = np.asarray(data["mask"])
    a = np.asarray(forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG))
    ids[0, 10:] = 77  # mutate padded region of row 0
    b = np.asarray(forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG))
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)


def test_wordpiece_tokenizer_parity(oracle):
    data, vocab_path = oracle
    tok = WordPieceTokenizer(str(vocab_path))
    for i, text in enumerate(TEXTS):
        enc = tok.encode(text, max_length=20)
        assert enc["input_ids"].tolist() == data[f"tok_ids_{i}"].tolist(), \
            f"tokenizer mismatch on {text!r}"
        assert enc["attention_mask"].tolist() == \
            data[f"tok_mask_{i}"].tolist()


def test_random_init_runs():
    params = init_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    logits = forward(params, ids, mask, CFG)
    assert logits.shape == (2, 28)
    assert bool(jnp.all(jnp.isfinite(logits)))
