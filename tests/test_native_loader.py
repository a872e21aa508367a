"""Native C++ loader: bit-identical to the Python tokenizer on Scheme B2/B3
(strict-parity and corrected modes), plus a throughput sanity check."""

import time

import numpy as np
import pytest

from eamg_tpu.tokenizer import SchemeB2, SchemeB3
from eamg_tpu.tools.native_loader import (explode_csv_native,
                                          native_available)
from eamg_tpu.train.data import iter_csv_tokens, write_synthetic_csv

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "synth.csv"
    write_synthetic_csv(str(path), 40, seed=3, n_notes=20)
    return str(path)


def python_explode(path, scheme_cls, seq_len, strict):
    sch = scheme_cls(seq_len=seq_len, strict_parity=strict)
    rows, lens = [], []
    for js in iter_csv_tokens(path):
        ids = sch.explode(js)
        lens.append(len(ids))
        rows.append(ids + [sch.vocab.pad_id] * (seq_len - len(ids)))
    return np.asarray(rows, np.int32), np.asarray(lens, np.int32)


@pytest.mark.parametrize("strict", [True, False])
def test_b2_matches_python(corpus, strict):
    ids_n, lens_n = explode_csv_native(corpus, "b2", seq_len=128,
                                       strict_parity=strict)
    ids_p, lens_p = python_explode(corpus, SchemeB2, 128, strict)
    np.testing.assert_array_equal(lens_n, lens_p)
    np.testing.assert_array_equal(ids_n, ids_p)


@pytest.mark.parametrize("strict", [True, False])
def test_b3_matches_python(corpus, strict):
    ids_n, lens_n = explode_csv_native(corpus, "b3", seq_len=128,
                                       strict_parity=strict)
    ids_p, lens_p = python_explode(corpus, SchemeB3, 128, strict)
    np.testing.assert_array_equal(lens_n, lens_p)
    np.testing.assert_array_equal(ids_n, ids_p)


def test_b3_unicode_flat_keys(tmp_path):
    """♭/♯ in key signatures survive the C++ JSON/UTF-8 path."""
    import csv
    import json

    path = tmp_path / "keys.csv"
    rows = [
        ["[START_SEQUENCE]", "[BPM] 99.0", "[KEY_SIGNATURE] E♭ major",
         "[NOTE] [PITCH:C4] [START:0.0] [END:0.5] [DURATION:0.5]",
         "[END_SEQUENCE]"],
        ["[START_SEQUENCE]", "[BPM] 150.0", "[KEY_SIGNATURE] F♯ minor",
         "[NOTE] [PITCH:D♭4] [START:0.25] [END:0.75] [DURATION:0.5]",
         "[END_SEQUENCE]"],
    ]
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["file", "key_signature", "tokens"])
        for i, r in enumerate(rows):
            w.writerow([f"{i}.mid", "", json.dumps(r)])
    ids_n, _ = explode_csv_native(str(path), "b3", seq_len=64)
    ids_p, _ = python_explode(str(path), SchemeB3, 64, True)
    np.testing.assert_array_equal(ids_n, ids_p)


def test_max_rows(corpus):
    ids, lens = explode_csv_native(corpus, "b2", max_rows=5, seq_len=64)
    assert ids.shape == (5, 64) and lens.shape == (5,)


def test_throughput_faster_than_python(tmp_path):
    path = tmp_path / "big.csv"
    write_synthetic_csv(str(path), 300, seed=4, n_notes=60)
    t0 = time.perf_counter()
    explode_csv_native(str(path), "b2", seq_len=512)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    python_explode(str(path), SchemeB2, 512, True)
    python_t = time.perf_counter() - t0
    # C++ should beat the Python row loop comfortably; allow slack for CI
    assert native_t < python_t, (native_t, python_t)
