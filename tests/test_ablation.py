"""Ablation harness: §10.4 table structure (paper rows: full / -KV /
-emotion tokens / -fine bins)."""

from eamg_tpu.tools.ablation import (AblationConfig, AblationRow,
                                     markdown_table, run_ablation)


def test_ablation_runs_and_emits_paper_rows():
    acfg = AblationConfig(n_rows=16, seq_len=32, d_model=32, n_head=2,
                          n_layer=1, epochs=1, micro_batch=8,
                          bpm_targets=(100, 140), gen_batch=1,
                          log_fn=lambda *_: None)
    rows = run_ablation(acfg)
    assert [r.name for r in rows] == [
        "full", "- KV cache", "- emotion tokens", "- fine bins"]
    for r in rows:
        assert r.ppl > 0 and r.ms_per_token > 0
    # -KV reuses the full model: identical teacher-forced PPL by
    # construction (our cache is exactly equivalent; see module docstring)
    assert rows[0].ppl == rows[1].ppl
    # retrained variants genuinely differ
    assert rows[2].ppl != rows[0].ppl

    table = markdown_table(rows)
    assert table.count("\n") == 5  # header + rule + 4 rows
    assert "MSE-Tune" in table and "- fine bins" in table


def test_markdown_table_formats_nan():
    rows = [AblationRow(name="full", ppl=1.17, mse_tune=float("nan"),
                        ms_per_token=0.29)]
    out = markdown_table(rows)
    assert "1.170" in out and "nan" in out
