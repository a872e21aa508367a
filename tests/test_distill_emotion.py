"""Distilled neural emotion classifier: corpus generator, scratch trainer,
packaged-checkpoint product path (VERDICT round-1 item 3 — the live
pipeline must classify with a real on-device neural forward)."""

import os

import numpy as np
import pytest

from eamg_tpu.emotion.config import ID2LABEL
from eamg_tpu.emotion.distill_data import (OOD_EVAL, build_wordpiece_vocab,
                                           label_banks, make_corpus)

PACKAGED = os.path.join(os.path.dirname(__file__), "..", "eamg_tpu",
                        "emotion", "ckpt_distilbert")


def test_label_banks_cover_all_labels():
    banks = label_banks()
    assert set(banks) == set(ID2LABEL.values())
    for label, forms in banks.items():
        assert len(forms) >= 10, label


def test_make_corpus_splits_are_disjoint_pairs():
    data = make_corpus(n_per_label=20, seed=3)
    train_x, train_y = data["train"]
    eval_x, eval_y = data["eval"]
    assert len(train_x) == len(train_y)
    assert set(train_y) == set(range(len(ID2LABEL)))
    # eval sentences use held-out templates: no exact overlap with train
    assert not set(eval_x) & set(train_x)
    assert len(data["eval_unseen_forms"][0]) > 0
    from eamg_tpu.emotion.distill_data import OOD_EVAL_CUE, OOD_IMPLICIT

    assert len(data["ood"][0]) == len(OOD_EVAL) + len(OOD_EVAL_CUE)
    assert len(data["ood_implicit"][0]) == len(OOD_IMPLICIT)
    # span supervision: one cue per train example, "" for cue-free
    assert len(data["train_cues"]) == len(train_x)
    assert any(c == "" for c in data["train_cues"])
    assert any(c and c in t for c, t in zip(data["train_cues"], train_x))
    # situation rows (round 3): whole-sentence cue spans (exempt from the
    # max-pool suppression penalty), held-out-template eval split, and —
    # critically — zero contamination of the hand-written implicit tier
    from eamg_tpu.emotion.distill_data import situation_banks

    assert set(situation_banks()) == set(ID2LABEL.values())
    assert any(c == t for c, t in zip(data["train_cues"], train_x))
    sx, sy = data["eval_situations"]
    assert len(sx) > 0 and not set(sx) & set(train_x)
    assert set(sy) == set(range(len(ID2LABEL)))
    assert not {t for t, _ in OOD_IMPLICIT} & set(train_x)


def test_situation_crosstalk_rate_pinned():
    """ADVICE r3 #2: situation sentences containing a DIFFERENT label's
    keyword-bank form are mild label noise (the whole sentence is the cue
    span). The advisor measured ~6% on banks 1-5; pin that it never
    regresses past 7%, and that the worst single (situation, other) pair
    stays small (no systematic cue leakage into one label)."""
    from collections import Counter

    from eamg_tpu.emotion.distill_data import (situation_banks,
                                               situation_crosstalk)

    hits = situation_crosstalk()
    n = sum(len(v) for v in situation_banks().values())
    assert len(hits) / n <= 0.07, (len(hits), n, hits[:10])
    worst = Counter((h[0], h[2]) for h in hits).most_common(1)
    assert worst[0][1] <= 5, worst


def test_no_training_source_duplicates_ood_sentences():
    """Round-5 regression guard: no situation bank template and no
    situation_gen fragment may reproduce an OOD/implicit EVAL sentence
    verbatim — a latent copy in situation_gen ('the invoice says
    paid...') contaminated the implicit exam whenever the generator's
    rng drew that frame."""
    import eamg_tpu.emotion.situation_gen as sg
    from eamg_tpu.emotion.distill_data import (OOD_EVAL, OOD_EVAL_CUE,
                                               OOD_IMPLICIT,
                                               situation_banks)

    protected = ({t for t, _ in OOD_IMPLICIT}
                 | {t for t, _ in OOD_EVAL}
                 | {t for t, _ in OOD_EVAL_CUE})
    gen_src = open(sg.__file__, encoding="utf-8").read()
    leaked = [t for t in protected if t in gen_src]
    assert leaked == [], leaked
    bank_texts = {t for v in situation_banks().values() for t in v}
    assert bank_texts & protected == set(), bank_texts & protected


def test_situation_own_cue_zero():
    """ADVICE r3 #1 / VERDICT r4 weak #2: no situation frame may contain
    its OWN label's keyword-bank form — a frame leaning on an explicit
    cue ('the right call' in an approval frame) scores as schema
    abstraction while being cue-driven. Fixed for banks 1-5 in round 5
    and pinned at zero for all future banks."""
    from eamg_tpu.emotion.distill_data import situation_own_cue

    hits = situation_own_cue()
    assert hits == [], hits[:10]


def test_situation_banks_shape():
    """Banks 6-7 (round 5): every label gains 16 genuinely new hand
    event frames (the r4-proven abstraction lever); no duplicate frames
    corpus-wide."""
    from collections import Counter

    from eamg_tpu.emotion.distill_data import situation_banks

    sb = situation_banks()
    assert all(len(v) >= 58 for v in sb.values()), {
        k: len(v) for k, v in sb.items() if len(v) < 58}
    all_s = [t for v in sb.values() for t in v]
    assert [t for t, c in Counter(all_s).items() if c > 1] == []


def test_make_corpus_deterministic():
    a = make_corpus(n_per_label=10, seed=7)
    b = make_corpus(n_per_label=10, seed=7)
    assert a["train"] == b["train"] and a["eval"] == b["eval"]


def test_wordpiece_vocab_char_fallback():
    vocab = build_wordpiece_vocab(["happy days are here"])
    from eamg_tpu.models.distilbert import WordPieceTokenizer

    tok = WordPieceTokenizer(vocab)
    # unseen word decomposes into subword pieces, not [UNK]
    pieces = tok.tokenize("happier")
    assert "[UNK]" not in pieces and len(pieces) > 1


def test_scratch_training_learns_tiny_problem():
    from eamg_tpu.emotion.train_scratch import ScratchSpec, distill_classifier

    import tempfile

    spec = ScratchSpec(dim=32, n_layers=1, n_heads=2, hidden_dim=64,
                       max_length=24, batch=32, epochs=2, n_per_label=24)
    with tempfile.TemporaryDirectory() as td:
        metrics = distill_classifier(td, spec=spec, log_fn=lambda *_: None)
        assert metrics["eval_acc_distilbert"] >= 0.0
        assert os.path.isfile(os.path.join(td, "params.pkl"))
        assert os.path.isfile(os.path.join(td, "vocab.txt"))
        # the saved dir loads through the product path
        from eamg_tpu.emotion import EmotionClassifier

        clf = EmotionClassifier(backend="distilbert", checkpoint_dir=td)
        assert clf.backend == "distilbert"
        label = clf.predict("i am so happy today")
        assert label in ID2LABEL.values()


@pytest.mark.skipif(not os.path.isdir(PACKAGED),
                    reason="packaged checkpoint not shipped")
class TestPackagedCheckpoint:
    def test_default_classifier_is_neural(self):
        from eamg_tpu.emotion.infer import EmotionClassifier

        clf = EmotionClassifier()  # backend="auto", no env var needed
        assert clf.backend == "distilbert"

    def test_all_prediction_modes(self):
        from eamg_tpu.emotion.infer import EmotionClassifier

        clf = EmotionClassifier()
        text = "thank you so much, this made my whole week"
        assert clf.predict(text) in ID2LABEL.values()
        allp = clf.predict_all_labels(text)
        assert len(allp) == len(ID2LABEL)
        np.testing.assert_allclose(sum(allp.values()), 1.0, atol=0.02)
        top3 = clf.predict_top_k_labels(text, k=3)
        assert len(top3) == 3 and top3[0][1] >= top3[1][1]
        thr = clf.predict_labels_above_threshold(text, threshold=0.01)
        assert thr
        trans = clf.analyze_emotion_transitions(
            "i love this. the spider terrified me.")
        assert len(trans) == 2

    def test_packaged_accuracy_floor(self):
        """The shipped checkpoint must beat the keyword lexicon it replaces
        on every split of its accuracy table (metrics.json), not just
        chance — the neural product path must be an upgrade, not a
        simulation (VERDICT r1 item 3)."""
        import json

        with open(os.path.join(PACKAGED, "metrics.json")) as f:
            raw = f.read()
        # strict RFC 8259: no bare NaN/Infinity literals (ADVICE r4 #1 —
        # empty splits must serialize as null, not NaN)
        def _reject(c):
            raise AssertionError(f"non-JSON literal {c} in metrics.json")
        m = json.loads(raw, parse_constant=_reject)
        assert m["eval_acc_distilbert"] > 0.9
        assert m["eval_acc_distilbert"] > m["eval_acc_lexicon"]
        assert m["unseen_forms_acc_distilbert"] > \
            m["unseen_forms_acc_lexicon"]
        assert m["ood_acc_distilbert"] > m["ood_acc_lexicon"]
        # round-5 floors, a few points under the shipped artifact
        # (seed 7, n_per_label 1200: OOD 0.815 / r2 0.857 / top3 0.946 /
        # forms 0.637 / situations 0.308 / implicit 0.455 / frozen
        # 0.417) — they pin the ARTIFACT against a silently-worse
        # re-ship, not the retrain distribution (seed variance is
        # large). Round-5 levers: banks 6-7 (+448 hand event frames)
        # and the rows-per-label hump at 1200 (swept {800, 1200, 1600})
        # — vs the r4 ship: frozen 0.333 -> 0.417, implicit 0.441 ->
        # 0.455, situations 0.240 -> 0.308, forms 0.569 -> 0.637, with
        # every cue tier also up (full tables in BENCHMARKS.md round-5
        # emotion sections).
        assert m["ood_acc_56_r2_metric"] >= 0.82, m
        assert m["ood_acc_distilbert"] >= 0.78, m
        assert m["ood_top3_distilbert"] >= 0.90, m
        assert m["unseen_forms_acc_distilbert"] >= 0.60, m
        assert m["ood_implicit_acc"] >= 0.42, m
        assert m["ood_implicit_top3"] >= 0.58, m
        assert m["eval_situations_acc"] >= 0.27, m
        # the frozen exam (never-trained generator eval-frames, committed
        # + hash-pinned) is the longitudinal abstraction metric
        assert m["frozen_exam_acc"] >= 0.38, m

    def test_sanity_predictions(self):
        from eamg_tpu.emotion.infer import EmotionClassifier

        clf = EmotionClassifier()
        # unambiguous trained surface forms must classify correctly
        assert clf.predict("i am grateful, thank you") == "gratitude"
        assert clf.predict("thank you so much") == "gratitude"
        assert clf.predict("i am furious and full of rage") == "anger"


def test_mlm_pretrain_reduces_masked_nll_and_keeps_tree():
    """MLM trunk pretraining (VERDICT r2 #2 lever (a)): masked-token NLL
    must fall over epochs, the returned tree must keep the classifier
    trainer's exact structure (tied head — no extra params), and
    forward_hidden must expose the [B, T, D] trunk."""
    import jax

    from eamg_tpu.models import distilbert as db
    from eamg_tpu.emotion.train_scratch import ScratchSpec, mlm_pretrain

    texts = ["the kettle switches itself off at the boil",
             "the spare key is with the building manager",
             "the ferry takes cars on the lower deck only",
             "the paint needs two coats with four hours between"] * 16
    vocab = build_wordpiece_vocab(texts)
    tok = db.WordPieceTokenizer(vocab)
    cfg = db.DistilBertConfig(
        vocab_size=len(vocab), max_position_embeddings=32, dim=64,
        n_layers=2, n_heads=2, hidden_dim=128, num_labels=len(ID2LABEL),
        pool="max")
    spec = ScratchSpec(dim=64, n_layers=2, hidden_dim=128, max_length=32,
                       batch=16, pretrain_epochs=6, seed=0)
    params = db.init_params(jax.random.PRNGKey(0), cfg)
    nlls = []
    out = mlm_pretrain(
        params, cfg, tok, texts, spec,
        log_fn=lambda s: nlls.append(float(s.rsplit("=", 1)[1])))
    assert len(nlls) == 6
    assert nlls[-1] < nlls[0] - 0.05, nlls
    assert jax.tree.structure(out) == jax.tree.structure(params)
    ids = np.zeros((2, 32), np.int32)
    mask = np.ones((2, 32), np.int32)
    assert db.forward_hidden(out, ids, mask, cfg).shape == (2, 32, 64)
