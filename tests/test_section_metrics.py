"""Per-section emotion-adaptivity metric (tools/section_metrics.py,
VERDICT r3 #8): structure, determinism, and the grid/key scoring math.
The real number runs on-chip against the trained flagship demo
(BENCHMARKS.md); here a tiny random model exercises the machinery."""

import pytest

from eamg_tpu.serve.pipeline import demo_pipeline
from eamg_tpu.tools.section_metrics import (_grid_fit, _grids_nested,
                                            _prompted_controls,
                                            measure_section_obedience)


def test_grid_fit_scoring():
    half = 60.0 / 120.0 / 2.0   # 0.25 s
    toks = [
        "[NOTE] [PITCH:C4] [START:0.0] [END:0.25] [DURATION:0.25]",
        f"[NOTE] [PITCH:D4] [START:{half * 3}] [END:1.0] "
        "[DURATION:0.25]",
        "[NOTE] [PITCH:C#4] [START:0.111] [END:0.3] [DURATION:0.19]",
    ]
    g, k, n = _grid_fit(toks, 120.0, "C major")
    assert n == 3
    assert g == pytest.approx(2 / 3)     # 0.111 is off-grid
    assert k == pytest.approx(2 / 3)     # C# is out of C major


def test_grids_nested():
    assert _grids_nested(60.0, 120.0)    # 2x: coarse grid inside fine
    assert not _grids_nested(90.0, 120.0)
    assert _grids_nested(75.0, 150.0)


def test_prompted_controls_parse():
    bpm, key = _prompted_controls(
        ["[START_SEQUENCE]", "[BPM] 90.0", "[KEY_SIGNATURE] D major",
         "[INSTRUMENT] Violin"])
    assert bpm == 90.0 and key == "D major"


def test_measure_runs_and_is_deterministic():
    pipe = demo_pipeline(corrected=True)
    m1 = measure_section_obedience(pipe, n_prompts=3, seed=4)
    m2 = measure_section_obedience(pipe, n_prompts=3, seed=4)
    assert m1 == m2
    assert m1["n_sections"] >= 3
    assert 0.0 <= m1["bpm_obedience"] <= 1.0
    assert 0.0 <= m1["key_obedience"] <= 1.0
    assert m1["classifier_intended_acc"] is not None
    # structure present even when pair discrimination had no eligible
    # pairs in a tiny run
    assert "bpm_discrimination" in m1 and "key_discrimination" in m1
