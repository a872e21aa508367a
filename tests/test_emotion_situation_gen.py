"""Compositional situation generator + frozen exam (situation_gen.py).

The generator replaces hand-curated situation banks as the scaling lever
for schema abstraction (VERDICT r3 #2); these tests pin its contracts:
split discipline (eval frames never train), the no-cue-word lint across
ALL labels (own label included — the ADVICE r3 'approval/right' finding
generalized), and the frozen exam's longitudinal comparability (hash).
"""

import hashlib
import json
import os
import random

import pytest

from eamg_tpu.emotion import situation_gen as sg
from eamg_tpu.emotion.config import ID2LABEL
from eamg_tpu.emotion.distill_data import make_corpus

EXAM_PATH = os.path.join(os.path.dirname(sg.__file__), "frozen_exam.json")

# Pin the committed exam byte-for-byte: the whole point of the frozen
# exam is that the number stays comparable across corpus versions. If
# the grammar changes, the exam does NOT — update this hash only when
# deliberately cutting exam v2 (and say so in BENCHMARKS.md).
EXAM_SHA256 = "32918651db453c5b08af2c2790502d27d99aa40b74b809f04864ab631fd08c8f"


def test_frozen_exam_pinned():
    with open(EXAM_PATH, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    assert digest == EXAM_SHA256
    exam = sg.frozen_exam()
    assert len(exam) == 168
    labels = {l for _, l in exam}
    assert labels == set(ID2LABEL.values())
    per = {}
    for _, l in exam:
        per[l] = per.get(l, 0) + 1
    assert all(v == 6 for v in per.values())


def test_schema_structure():
    assert set(sg.SCHEMAS) == set(ID2LABEL.values())
    for label, spec in sg.SCHEMAS.items():
        assert len(spec["events"]) == 10, label
        assert len(spec["consequences"]) == 6, label
        ev_tr, cq_tr = sg.split_schemas(label, "train")
        ev_ev, cq_ev = sg.split_schemas(label, "eval")
        assert not set(ev_tr) & set(ev_ev)
        assert not set(cq_tr) & set(cq_ev)
        assert len(ev_ev) == sg.N_EVAL_EVENTS
        assert len(cq_ev) == sg.N_EVAL_CONSEQ
    # hundreds of composable schemas per label, the round-3 lever
    assert sg.schema_count("anger", "train") >= 250


def test_no_cue_crosstalk():
    """No generator template contains ANY label's keyword-bank form —
    own label included: a cue word inside a situation template would
    let the cue, not the schema, carry the label (the tier exists to
    measure situation->emotion abstraction)."""
    hits = sg.generator_crosstalk()
    assert hits == [], hits[:10]


def test_eval_split_never_trains():
    """Train-split generation can never emit an eval event frame: the
    event clause of every train sentence comes from the train frames."""
    rng = random.Random(0)
    for label in ("anger", "grief", "neutral"):
        ev_eval, cq_eval = sg.split_schemas(label, "eval")
        # strip slots to comparable fragments
        import re

        frags = [re.sub(r"\{[a-z]+\}", "", t)[:25] for t in ev_eval]
        for s in sg.generate(label, rng, 200, split="train"):
            for frag in frags:
                if len(frag) > 10:
                    assert frag not in s, (label, s)


def test_generate_composition_shapes():
    rng = random.Random(7)
    outs = sg.generate("fear", rng, 50, split="train")
    assert len(outs) == 50
    assert len(set(outs)) > 30          # slot/schema diversity
    assert all("{" not in s for s in outs)  # every slot filled


def test_make_corpus_gen_splits():
    data = make_corpus(n_per_label=24, seed=3, gen_per_label=12)
    gx, gy = data["eval_gen_schemas"]
    fx, fy = data["frozen_exam"]
    assert len(fx) == 168
    assert len(gx) >= 28 * 3
    train_set = set(data["train"][0])
    # exam and gen-eval sentences are strictly unseen
    assert not set(fx) & train_set
    assert not set(gx) & train_set
    # generator rows actually landed in train (count grew vs disabled)
    data0 = make_corpus(n_per_label=24, seed=3, gen_per_label=0)
    assert len(data["train"][0]) > len(data0["train"][0]) + 28 * 10
    assert data0["eval_gen_schemas"][0] == []


def test_exam_matches_generator_eval_split():
    """Every exam sentence is reproducible from the eval schema split
    (it was cut from build_frozen_exam with the committed seed) — i.e.
    the exam measures held-out schemas, not arbitrary text."""
    rebuilt = sg.build_frozen_exam(per_label=6, seed=20260820)
    with open(EXAM_PATH, encoding="utf-8") as f:
        committed = [(r["text"], r["label"]) for r in json.load(f)]
    assert rebuilt == committed


def test_fill_is_deterministic_under_seed():
    a = sg.generate("joy", random.Random(11), 20)
    b = sg.generate("joy", random.Random(11), 20)
    assert a == b
