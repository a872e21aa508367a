"""Host data-pipeline feed-rate proof machinery (tools/feed_bench.py,
VERDICT r3 #6). Tiny geometry on CPU — the corpus-scale number runs
on-chip (BENCHMARKS.md)."""

from eamg_tpu.tools.feed_bench import run_feed_bench


def test_feed_bench_structure():
    out = run_feed_bench(rows=200, notes=10, steps=4, shards=2,
                         micro_batch=4, d_model=32, n_head=2,
                         n_layer=1, loss_chunk=None, seq_len=64)
    assert out["corpus_tokens"] > 0
    assert out["host_tokens_per_s"] > 0
    assert out["device_tokens_per_s"] > 0
    assert out["streamed_step_ms"] > 0
    assert out["rows"] == 200
    # the C++ loader must exist on a toolchain host and beat Python
    if out["native_loader"]:
        assert out["host_tokens_per_s"] > out["python_tokens_per_s"]
