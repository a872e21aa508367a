"""Emotion classifier checkpoint round trip: our ckpt dir -> HF snapshot ->
back through the importer (torch steps in a subprocess), plus the
distilbert-backend EmotionClassifier path end-to-end."""

import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax

from eamg_tpu.emotion import EmotionClassifier
from eamg_tpu.models import distilbert as db

CFG_KW = dict(vocab_size=40, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
              max_position_embeddings=64, num_labels=28)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "happy", "sad",
         "scared", "i", "am", "so", "the", "of", "and", "!", "."]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emo_ckpt")
    cfg = db.DistilBertConfig(**CFG_KW)
    params = db.init_params(jax.random.PRNGKey(0), cfg)
    with open(d / "params.pkl", "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    with open(d / "config.pkl", "wb") as f:
        pickle.dump(CFG_KW, f)
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    return str(d)


def test_classifier_distilbert_backend(ckpt_dir):
    clf = EmotionClassifier(backend="distilbert", checkpoint_dir=ckpt_dir,
                            max_length=16)
    label = clf.predict("i am so happy")
    from eamg_tpu.emotion import ID2LABEL

    assert label in ID2LABEL.values()
    scores = clf.predict_all_labels("i am so happy")
    assert len(scores) == 28
    assert abs(sum(scores.values()) - 1.0) < 0.02
    top = clf.predict_top_k_labels("i am so sad", k=5)
    assert len(top) == 5 and top[0][1] >= top[-1][1]


def test_missing_checkpoint_raises():
    with pytest.raises(FileNotFoundError):
        EmotionClassifier(backend="distilbert",
                          checkpoint_dir="/nonexistent/path")


def test_hf_export_round_trip(ckpt_dir, tmp_path):
    """export_emotion_hf -> convert_hf_distilbert (torch, in a subprocess)
    must reproduce the original params bit-for-bit."""
    hf_dir = tmp_path / "hf"
    back_dir = tmp_path / "back"
    script = (
        "import sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from eamg_tpu.tools.publish import export_emotion_hf\n"
        "from eamg_tpu.tools.convert import convert_hf_distilbert\n"
        f"export_emotion_hf({ckpt_dir!r}, {str(hf_dir)!r})\n"
        f"convert_hf_distilbert({str(hf_dir)!r}, {str(back_dir)!r})\n")
    subprocess.run([sys.executable, "-c", script], check=True, timeout=900)

    assert (hf_dir / "config.json").exists()
    assert (hf_dir / "pytorch_model.bin").exists()
    assert (hf_dir / "vocab.txt").exists()

    with open(f"{ckpt_dir}/params.pkl", "rb") as f:
        orig = pickle.load(f)
    with open(back_dir / "params.pkl", "rb") as f:
        back = pickle.load(f)
    for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the converted dir serves
    clf = EmotionClassifier(backend="distilbert",
                            checkpoint_dir=str(back_dir), max_length=16)
    assert isinstance(clf.predict("i am so scared"), str)


def test_probs_memoized_per_text():
    """Round 5: the classifier forward is deterministic, so per-text
    memoization must return identical results, hit the cache on repeat
    (no new entry), and stay bounded."""
    from eamg_tpu.emotion.infer import EmotionClassifier

    clf = EmotionClassifier()
    if clf.backend == "lexicon":
        import pytest
        pytest.skip("no neural checkpoint shipped")
    a = clf.predict("i am grateful, thank you")
    n0 = len(clf._probs_cache)
    b = clf.predict("i am grateful, thank you")
    assert a == b
    assert len(clf._probs_cache) == n0          # served from cache
    import numpy as np
    assert isinstance(next(iter(clf._probs_cache.values())), np.ndarray)
    # bound: with the cache AT the cap, a real predict must evict the
    # oldest entry (FIFO) and stay exactly at the cap
    clf._probs_cache.clear()
    for i in range(512):
        clf._probs_cache[f"k{i}"] = np.zeros(1)
    clf.predict("a fresh sentence about the harvest")
    assert len(clf._probs_cache) == 512
    assert "k0" not in clf._probs_cache          # oldest evicted
    assert "a fresh sentence about the harvest" in clf._probs_cache
