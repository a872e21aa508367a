"""Host data-pipeline feed-rate proof (VERDICT r3 #6).

The flagship trainer consumes ~570k tokens/s at the reference batch-16
geometry (DESIGN.md §3.8); the reference streamed its corpus through a
synchronous DataLoader that blocked every step
(train/train_large.py:94-122, num_workers=0). This tool proves the
TPU-side host pipeline feeds the chip at corpus scale, three numbers:

1. ``host_tokens_per_s`` — the C++ loader's sustained CSV -> exploded ->
   padded id rate over a ~100k-song corpus (tools/native_loader.py;
   Python fallback rate measured on a slice for comparison);
2. ``device_tokens_per_s`` — chip demand: tokens/step over the measured
   flagship step time (same Trainer/chunked-CE as §3.8);
3. ``overlap`` — a sharded streaming run: the prefetch thread explodes
   shard k+1 (REAL host work) while the device trains on shard k
   (train/prefetch.PrefetchIterator, depth 2). Done = streamed ms/step
   ~= device-resident ms/step (input hidden), or the input-bound gap.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax

from ..models.gpt import GPTConfig, init_params
from ..tokenizer import SchemeB2
from ..train.data import write_synthetic_csv
from ..train.prefetch import PrefetchIterator
from ..train.trainer import TrainConfig, Trainer
from .native_loader import explode_csv, native_available


def _ensure_corpus(rows: int, notes: int, shards: int,
                   base: str = "/tmp/eamg_feed") -> list[str]:
    """``shards`` CSV files of rows/shards songs each (cached)."""
    paths = []
    per = rows // shards
    for s in range(shards):
        p = f"{base}_{rows}x{notes}_{s:02d}of{shards}.csv"
        if not os.path.exists(p):
            write_synthetic_csv(p, per, seed=s, n_notes=notes)
        paths.append(p)
    return paths


def run_feed_bench(rows: int = 100_000, notes: int = 126,
                   seq_len: int = 512, micro_batch: int = 16,
                   steps: int = 200, shards: int = 16,
                   loss_chunk: int | None = 73, d_model: int = 512,
                   n_head: int = 8, n_layer: int = 6) -> dict:
    sch = SchemeB2(seq_len=seq_len)
    paths = _ensure_corpus(rows, notes, shards)
    csv_bytes = sum(os.path.getsize(p) for p in paths)

    # ---- 1. host rate: native explode over the whole corpus ----------
    t0 = time.perf_counter()
    shard_ids = []
    total_tokens = 0
    for p in paths:
        ids, lens = explode_csv(p, scheme="b2", seq_len=seq_len)
        total_tokens += int(lens.sum())
        shard_ids.append(ids)
    host_s = time.perf_counter() - t0
    host_rate = total_tokens / host_s

    # Python-fallback rate on one shard (the native speedup factor)
    t0 = time.perf_counter()
    from ..train.data import iter_csv_tokens

    py_tokens = 0
    for js in iter_csv_tokens(paths[0], max_rows=2000):
        py_tokens += len(sch.explode(js))
    py_rate = py_tokens / (time.perf_counter() - t0)

    # ---- 2. chip demand: flagship step time, device-resident batch ---
    cfg = GPTConfig(vocab_size=len(sch.vocab), seq_len=seq_len,
                    d_model=d_model, n_head=n_head, n_layer=n_layer,
                    causal=True, dtype="bfloat16")
    tcfg = TrainConfig(micro_batch=micro_batch, epochs=1,
                       pad_id=sch.vocab.pad_id, loss_chunk=loss_chunk)
    trainer = Trainer(cfg, tcfg, init_params(jax.random.PRNGKey(0), cfg))
    ids0 = shard_ids[0][:micro_batch]
    # Trainer.train_step consumes [accum, micro, T] batches (accum=1)
    x0 = jax.device_put(ids0[None, :, :-1])
    y0 = jax.device_put(ids0[None, :, 1:])
    trainer.train_step(x0, y0, sync=True)          # compile
    # best-of-3 windows: tunnel dispatch outliers land on whole windows
    # (the §3.9 interleaving lesson), so one 20-step window can read
    # 50% high; three 40-step windows with a min() are stable.
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(40):
            m = trainer.train_step(x0, y0, sync=False)
        _ = float(m["loss"])                       # drain the stream
        windows.append((time.perf_counter() - t0) / 40 * 1000)
    dev_step_ms = min(windows)
    tokens_per_step = micro_batch * (seq_len - 1)
    dev_rate = tokens_per_step / (dev_step_ms / 1000)

    # ---- 3. overlap: stream shards through the prefetch thread -------
    def host_stream():
        """REAL host work per shard: CSV parse + explode + pad (the
        loader), then per-batch shift/split — what train/run.py does."""
        s = 0
        while True:
            ids, _ = explode_csv(paths[s % shards], scheme="b2",
                                 seq_len=seq_len)
            for b in range(0, len(ids) - micro_batch + 1, micro_batch):
                chunk = ids[b:b + micro_batch]
                yield chunk[None, :, :-1], chunk[None, :, 1:]
            s += 1

    it = PrefetchIterator(host_stream(), depth=2)
    for _ in range(3):                             # warm the queue
        x, y = next(it)
        trainer.train_step(x, y, sync=False)
    t0 = time.perf_counter()
    for _ in range(steps):
        x, y = next(it)
        m = trainer.train_step(x, y, sync=False)
    _ = float(m["loss"])
    stream_step_ms = (time.perf_counter() - t0) / steps * 1000

    return {
        "rows": rows, "csv_mb": round(csv_bytes / 1e6, 1),
        "corpus_tokens": total_tokens,
        "native_loader": native_available(),
        "host_tokens_per_s": round(host_rate),
        "python_tokens_per_s": round(py_rate),
        "device_step_ms": round(dev_step_ms, 2),
        "device_tokens_per_s": round(dev_rate),
        "host_over_demand": round(host_rate / dev_rate, 2),
        "streamed_step_ms": round(stream_step_ms, 2),
        "overlap_overhead_pct": round(
            (stream_step_ms / dev_step_ms - 1) * 100, 1),
    }
