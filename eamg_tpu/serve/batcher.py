"""Request coalescing: concurrent /generate calls share one device program.

Requests arriving within a small window are grouped (same sampling params),
padded into a ragged batch (decode/ragged.py) and decoded together; each
row carries its own PRNG key, so a coalesced request returns exactly the
stream it would have produced alone (tested:
test_ragged_row_rng_independent_of_batch_composition). Batch sizes bucket
to {1, 2, 4, 8, ...} with dummy rows so compiled programs are reused.

The reference served requests strictly serially (uvicorn worker + module
globals); this is the TPU-native answer to BASELINE config 5's concurrent
replay.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..decode.api import Generator, _bucket
from ..decode.ragged import generate_kv_ragged


@dataclass
class _Pending:
    prompt_ids: list
    temperature: float
    top_k: int
    top_p: float
    min_p: float
    greedy: bool
    seed: int
    max_len: int
    penalties: tuple = (1.0, 0.0, 0.0)   # (repetition, frequency, presence)
    ngram: int = 0                       # no_repeat_ngram_size (0 = off)
    grammar: bool = False                # FSM-constrained decoding
    event: threading.Event = field(default_factory=threading.Event)
    result: list | None = None
    error: Exception | None = None


class RequestBatcher:
    def __init__(self, generator: Generator, max_batch: int = 8,
                 window_ms: float = 10.0, max_len: int | None = None,
                 max_queue: int = 256, grammar=None):
        self.gen = generator
        # optional decode.grammar.Grammar: requests asking grammar=True
        # decode FSM-constrained; groups split on the flag so plain rows
        # share their usual program
        self.grammar = grammar
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        self.max_len = min(max_len or generator.cfg.seq_len,
                           generator.max_supported_len())
        self.max_queue = max_queue       # 0 = unbounded
        self._q: queue.Queue = queue.Queue()
        self.stats = {"calls": 0, "requests": 0, "max_group": 0,
                      "rejected": 0}
        self._stop = False
        self._busy = False   # worker holds a dequeued group (drain())
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client

    def overloaded(self) -> bool:
        return bool(self.max_queue) and self._q.qsize() >= self.max_queue

    def accepts(self, grammar: bool = False, **_) -> bool:
        """The window batcher compiles per param-combo, so it takes any
        sampling params — only a grammar request needs the table to have
        been provided at construction (callers fall back to a solo
        decode otherwise)."""
        return not grammar or self.grammar is not None

    def submit(self, prompt_ids: list[int], temperature: float = 1.0,
               top_k: int = 50, greedy: bool = False,
               seed: int | None = None, timeout: float = 600.0,
               max_len: int | None = None, top_p: float = 1.0,
               min_p: float = 0.0,
               penalties: tuple | None = None,
               no_repeat_ngram: int = 0, grammar: bool = False) -> list:
        ml = int(min(max_len or self.max_len, self.max_len))
        if len(prompt_ids) >= ml:
            # zero generation steps: prompt returned unchanged (reference
            # semantics, api_cache.py:166) — same contract as generate_ids,
            # ContinuousBatcher.submit, and stream_tokens
            return list(prompt_ids)
        pen = (tuple(float(v) for v in penalties) if penalties is not None
               else (1.0, 0.0, 0.0))
        if grammar and self.grammar is None:
            raise ValueError(
                "batcher was built without a grammar table; construct "
                "RequestBatcher(grammar=...) for constrained requests")
        req = _Pending(prompt_ids, float(temperature), int(top_k),
                       float(top_p), float(min_p), bool(greedy),
                       int(seed) if seed is not None
                       else int(time.time_ns() % 2**31), ml, pen,
                       int(no_repeat_ngram or 0), bool(grammar))
        if self.overloaded():
            from .continuous import EngineOverloaded

            self.stats["rejected"] += 1
            raise EngineOverloaded(
                f"batcher admission queue full "
                f"({self.max_queue} requests waiting)")
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def drain(self, timeout: float = 30.0) -> bool:
        """Wait for queued + in-flight groups to finish (graceful
        shutdown, same contract — incl. the three-consecutive-idle-poll
        rule — as ContinuousBatcher.drain)."""
        deadline = time.monotonic() + timeout
        idle = 0
        while time.monotonic() < deadline:
            if self._q.qsize() == 0 and not self._busy:
                idle += 1
                if idle >= 3:
                    return True
            else:
                idle = 0
            time.sleep(0.05)
        return self._q.qsize() == 0 and not self._busy

    def close(self, timeout: float = 30.0):
        """Stop the worker and join it — a daemon thread killed mid-jax-
        call at interpreter exit aborts the process."""
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout)

    # ------------------------------------------------------------- worker

    def _worker(self):
        while not self._stop:
            first = self._q.get()
            self._busy = True     # before any check: drain() must see it
            if first is None:
                break
            group = [first]
            deadline = time.monotonic() + self.window
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:          # close() sentinel mid-window
                    self._stop = True
                    break
                group.append(nxt)
            # split by sampling params (one compiled call per combo);
            # max_len buckets to powers of two so programs are reused
            by_params: dict = {}
            for r in group:
                ml = 1 << (r.max_len - 1).bit_length()
                ml = min(ml, self.max_len)
                by_params.setdefault(
                    (r.temperature, r.top_k, r.top_p, r.min_p, r.greedy,
                     ml, r.penalties, r.ngram, r.grammar), []).append(r)
            for (temp, top_k, top_p, min_p, greedy, ml, pen, ngram,
                 gram), reqs in by_params.items():
                try:
                    self._run(reqs, temp, top_k, greedy, ml, top_p, min_p,
                              pen, ngram, gram)
                except Exception as exc:  # pragma: no cover - defensive
                    for r in reqs:
                        r.error = exc
                        r.event.set()
            self._busy = False

    def _run(self, reqs, temperature, top_k, greedy, max_len=None,
             top_p=1.0, min_p=0.0, penalties=(1.0, 0.0, 0.0),
             no_repeat_ngram=0, grammar=False):
        max_len = max_len or self.max_len
        n = len(reqs)
        bs = 1
        while bs < n:
            bs *= 2
        width = min(_bucket(max(len(r.prompt_ids) for r in reqs)),
                    max_len)
        prompt = np.full((bs, width), self.gen.pad_id, np.int32)
        lens = np.ones((bs,), np.int32)  # dummy rows: 1-token prompts
        seeds = np.zeros((bs,), np.uint32)
        for i, r in enumerate(reqs):
            # Leave at least one generation slot: a prompt that fills the
            # request's whole budget would otherwise produce nothing.
            p = r.prompt_ids[:min(width, max(1, r.max_len - 1))]
            prompt[i, :len(p)] = p
            lens[i] = len(p)
            seeds[i] = r.seed
        rngs = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
        buf, pos = generate_kv_ragged(
            self.gen.params, jnp.asarray(prompt), jnp.asarray(lens), rngs,
            self.gen.cfg, max_len, temperature=temperature,
            top_k=top_k, eos_id=self.gen.eos_id, pad_id=self.gen.pad_id,
            greedy=greedy, top_p=top_p, min_p=min_p,
            penalties=penalties, no_repeat_ngram=no_repeat_ngram,
            grammar=self.grammar if grammar else None)
        buf = np.asarray(buf)
        pos = np.asarray(pos)
        self.stats["calls"] += 1
        self.stats["requests"] += n
        self.stats["max_group"] = max(self.stats["max_group"], n)
        for i, r in enumerate(reqs):
            r.result = buf[i, :min(int(pos[i]), r.max_len)].tolist()
            r.event.set()
