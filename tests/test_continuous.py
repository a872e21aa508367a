"""Continuous batching: requests join/leave a RUNNING ragged decode, and
every row still bit-matches its solo stream (VERDICT round-1 item 2)."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator
from eamg_tpu.decode.ragged import generate_kv_ragged
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.serve.continuous import ContinuousBatcher
from eamg_tpu.tokenizer import Vocab

CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
                pos_rows=48, causal=True)


@pytest.fixture(scope="module")
def generator():
    params = init_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, Vocab({str(i): i for i in range(64)}),
                     eos_token="none", pad_token="0")


def solo(generator, prompt_ids, seed, max_len, temperature=1.0):
    width = 16
    while width < len(prompt_ids):
        width *= 2
    width = min(width, max_len)  # prefill requires P <= cache max_len
    prompt = np.zeros((1, width), np.int32)
    prompt[0, :len(prompt_ids)] = prompt_ids
    buf, pos = generate_kv_ragged(
        generator.params, jnp.asarray(prompt),
        jnp.asarray([len(prompt_ids)], np.int32),
        jax.random.PRNGKey(seed)[None], CFG, max_len,
        temperature=temperature, top_k=50, eos_id=-1, pad_id=0)
    return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()


def test_concurrent_rows_match_solo(generator):
    eng = ContinuousBatcher(generator, slots=4, chunk=4, max_len=24)
    try:
        prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
        seeds = [11, 22, 33, 44]
        results = [None] * 4

        def hit(i):
            results[i] = eng.submit(prompts[i], seed=seeds[i])

        threads = [threading.Thread(target=hit, args=(i,), daemon=True)
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i in range(4):
            assert results[i] == solo(generator, prompts[i], seeds[i],
                                      eng.max_len), i
        assert eng.stats["served"] == 4
    finally:
        eng.close()


def t1_done(results):
    return "long" in results


def test_midstream_join_matches_solo(generator):
    """The defining property: a request admitted while another is decoding
    produces the same stream as alone, and starts without waiting for the
    running generation to finish."""
    eng = ContinuousBatcher(generator, slots=2, chunk=2, max_len=32)
    try:
        results = {}

        def hit(name, prompt, seed):
            results[name] = eng.submit(prompt, seed=seed)

        t1 = threading.Thread(target=hit, args=("long", [1, 2, 3], 7),
                              daemon=True)
        t1.start()
        # wait until the first decode is actually running (first call pays
        # jit compile, so poll rather than sleep a fixed interval)
        deadline = time.monotonic() + 300
        while eng.stats["chunks"] < 1 and not t1_done(results) \
                and time.monotonic() < deadline:
            time.sleep(0.01)
        chunks_before = eng.stats["chunks"]
        t2 = threading.Thread(target=hit, args=("joiner", [9, 8], 13),
                              daemon=True)
        t2.start()
        t1.join(timeout=600)
        t2.join(timeout=600)

        assert results["long"] == solo(generator, [1, 2, 3], 7, 32)
        assert results["joiner"] == solo(generator, [9, 8], 13, 32)
        # the joiner really arrived mid-decode (or the long row was so
        # fast it already finished, which still exercises admission)
        assert chunks_before >= 1 or "long" in results
    finally:
        eng.close()


def test_more_requests_than_slots(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16)
    try:
        results = [None] * 5

        def hit(i):
            results[i] = eng.submit([i + 1], seed=i)

        threads = [threading.Thread(target=hit, args=(i,), daemon=True)
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i in range(5):
            assert results[i] == solo(generator, [i + 1], i, 16), i
    finally:
        eng.close()


def test_per_request_temperature_and_max_len(generator):
    eng = ContinuousBatcher(generator, slots=4, chunk=4, max_len=32)
    try:
        a = eng.submit([1, 2], seed=5, temperature=0.7, max_len=12)
        b = eng.submit([1, 2], seed=5, temperature=1.3, max_len=30)
        assert a == solo(generator, [1, 2], 5, 12, temperature=0.7)
        assert b == solo(generator, [1, 2], 5, 30, temperature=1.3)
        assert len(a) <= 12 and len(b) > 12
    finally:
        eng.close()


def test_overlength_prompt_returns_prompt(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16)
    try:
        prompt = list(range(1, 20))
        assert eng.submit(prompt, seed=0) == prompt
    finally:
        eng.close()


def test_engine_param_mismatch_raises(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16,
                            top_k=50)
    try:
        with pytest.raises(ValueError):
            eng.submit([1, 2], top_k=10)
        with pytest.raises(ValueError):
            eng.submit([1, 2], greedy=True)
    finally:
        eng.close()


def test_slot_reuse_after_harvest(generator):
    """Sequential requests cycle through slots; state from a previous
    occupant must never leak into the next request's stream."""
    eng = ContinuousBatcher(generator, slots=1, chunk=4, max_len=16)
    try:
        for seed in (3, 4, 5):
            got = eng.submit([2, 3], seed=seed)
            assert got == solo(generator, [2, 3], seed, 16), seed
    finally:
        eng.close()


def test_randomized_stress_all_rows_match_solo(generator):
    """Fuzz the admission machinery: many requests with random prompt
    lengths, budgets, temperatures, and arrival jitter, over few slots —
    EVERY result must still bit-match its solo ragged stream."""
    rng = np.random.default_rng(123)
    eng = ContinuousBatcher(generator, slots=3, chunk=8, max_len=40)
    reqs = []
    for i in range(24):
        plen = int(rng.integers(1, 20))
        reqs.append({
            "prompt": rng.integers(1, 64, plen).tolist(),
            "seed": int(rng.integers(0, 2**31)),
            "max_len": int(rng.integers(plen + 2, 41)),
            "temperature": float(rng.choice([0.7, 1.0, 1.3])),
        })
    results = [None] * len(reqs)

    def hit(i, r):
        time.sleep(float(rng.integers(0, 20)) / 1000)
        results[i] = eng.submit(r["prompt"], temperature=r["temperature"],
                                seed=r["seed"], max_len=r["max_len"])

    threads = [threading.Thread(target=hit, args=(i, r), daemon=True)
               for i, r in enumerate(reqs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    eng.close()
    for i, r in enumerate(reqs):
        want = solo(generator, r["prompt"], r["seed"], r["max_len"],
                    temperature=r["temperature"])
        assert results[i] == want, f"request {i} diverged"


def test_worker_survives_engine_error(generator, monkeypatch):
    """An exception inside the worker fails the in-flight request with the
    cause (not a 600 s TimeoutError) and the engine keeps serving."""
    import eamg_tpu.serve.continuous as cont

    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16)
    try:
        real = cont.ragged_chunk
        calls = {"n": 0}

        def boom(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected backend failure")
            return real(*a, **k)

        monkeypatch.setattr(cont, "ragged_chunk", boom)
        with pytest.raises(RuntimeError, match="injected"):
            eng.submit([1, 2], seed=1, timeout=60)
        # engine recovered: next request succeeds and matches solo
        got = eng.submit([3, 4], seed=2, timeout=120)
        assert got == solo(generator, [3, 4], 2, 16)
    finally:
        eng.close()


def test_accepts_mismatched_params(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16,
                            top_k=50, greedy=False)
    try:
        assert eng.accepts(top_k=50) and eng.accepts()
        assert not eng.accepts(top_k=10)
        assert not eng.accepts(greedy=True)
    finally:
        eng.close()


def test_cancel_mid_stream_frees_slot(generator, monkeypatch):
    """Closing a stream generator (SSE client disconnect) cancels the row:
    the slot frees at the next chunk boundary instead of decoding to
    completion, and the engine keeps serving correctly.

    The worker's chunk step is gated by a semaphore so the cancel
    deterministically lands while the row is still live — without the gate
    the row can decode to natural completion before the worker drains the
    cancel queue (a served row, cancelled==0: the race this test flaked
    on), which is legitimate engine behavior but not the path under test.
    The first delta reaches the stream after the second chunk dispatch
    (depth-1 lookahead harvest), so the gate opens with two permits."""
    from eamg_tpu.serve import continuous as cont

    gate = threading.Semaphore(2)
    real_chunk = cont.ragged_chunk

    def gated_chunk(*args, **kwargs):
        gate.acquire()
        return real_chunk(*args, **kwargs)

    monkeypatch.setattr(cont, "ragged_chunk", gated_chunk)
    eng = ContinuousBatcher(generator, slots=1, chunk=2, max_len=32)
    try:
        stream = eng.submit_stream([1, 2], seed=5, max_len=32)
        first = next(stream)
        assert first  # at least one delta arrived before the disconnect
        stream.close()  # raises GeneratorExit inside submit_stream
        # the cancel is queued while the worker is parked at the gate with
        # the row still live; release it and the slot must free at the
        # next loop iteration — with a zombie holding it the submit below
        # would block until the 120 s timeout
        for _ in range(64):
            gate.release()
        out = eng.submit([3, 4], seed=9, max_len=16, timeout=120)
        assert out == solo(generator, [3, 4], 9, 16)
        assert eng.stats["cancelled"] == 1
    finally:
        for _ in range(64):
            gate.release()  # never leave the worker parked at close()
        eng.close()


def test_submit_timeout_cancels_queued_request(generator):
    """A submit() that times out marks its request cancelled so it never
    occupies a slot later; the engine stays healthy."""
    eng = ContinuousBatcher(generator, slots=1, chunk=2, max_len=48)
    try:
        stream = eng.submit_stream([1, 2], seed=1, max_len=48)
        next(stream)  # slot busy
        with pytest.raises(TimeoutError):
            eng.submit([5, 6], seed=2, max_len=16, timeout=0.0)
        for _ in stream:  # drain the first request to completion
            pass
        # cancelled request is skipped at admission; a live one still works
        out = eng.submit([7, 8], seed=3, max_len=16, timeout=120)
        assert out == solo(generator, [7, 8], 3, 16)
        assert eng.stats["cancelled"] >= 1
        assert eng.stats["served"] >= 1
    finally:
        eng.close()


def test_pipeline_stream_close_cancels_engine_row():
    """Pipeline.generate_stream -> engine plumbing: closing the SSE event
    generator mid-stream reaches the engine and frees the slot."""
    from eamg_tpu.serve.pipeline import demo_pipeline

    pipe = demo_pipeline(corrected=True, coalesce="continuous")
    # small chunks so the row is still decoding when the client disconnects
    # (the default 64-step chunk finishes the 128-token demo row before the
    # first delta even reaches the consumer)
    pipe.batcher.close()
    pipe.batcher = ContinuousBatcher(pipe.generator, slots=2, chunk=2,
                                     max_len=96)
    eng = pipe.batcher
    try:
        ev_stream = pipe.generate_stream("joyful melody", seed=3,
                                         render_audio=False)
        saw_tokens = False
        for ev in ev_stream:
            if ev["event"] == "tokens":
                saw_tokens = True
                break
        assert saw_tokens
        ev_stream.close()
        deadline = time.monotonic() + 60
        while eng.stats["cancelled"] < 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert eng.stats["cancelled"] == 1
        assert len(eng._free) + len(eng._live) == eng.slots
    finally:
        eng.close()


def test_admission_queue_overload_and_drain(generator):
    """Production load shedding: with one slot busy and the admission
    queue at max_queue, further submits raise EngineOverloaded instead of
    queueing without bound; drain() reports idle after completion."""
    from eamg_tpu.serve.continuous import EngineOverloaded

    eng = ContinuousBatcher(generator, slots=1, chunk=4, max_len=40,
                            max_queue=1)
    try:
        results = {}

        def hit(name, seed):
            try:
                results[name] = eng.submit([1, 2, 3], seed=seed,
                                           timeout=600)
            except EngineOverloaded as exc:
                results[name] = exc

        ta = threading.Thread(target=hit, args=("a", 1), daemon=True)
        ta.start()
        deadline = time.monotonic() + 120
        while eng.stats["admitted"] < 1:      # a holds the only slot
            assert time.monotonic() < deadline, "first admit never happened"
            time.sleep(0.02)
        tb = threading.Thread(target=hit, args=("b", 2), daemon=True)
        tb.start()
        while eng._q.qsize() < 1:             # b is parked in the queue
            assert time.monotonic() < deadline, "b never queued"
            time.sleep(0.02)
        assert eng.overloaded()
        hit("c", 3)                            # queue full -> shed
        ta.join(600)
        tb.join(600)
        assert isinstance(results["c"], EngineOverloaded)
        assert isinstance(results["a"], list)
        assert isinstance(results["b"], list)
        assert eng.stats["rejected"] == 1
        assert eng.drain(timeout=30)
        assert not eng.overloaded()
    finally:
        eng.close()


def test_moe_model_through_engine_matches_solo():
    """MoE-GPT (GPTConfig.n_experts) composes with the continuous engine:
    routed-expert KV decode inside ragged_chunk bit-matches the same
    request decoded alone."""
    from eamg_tpu.tokenizer import Vocab as _V

    moe_cfg = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4,
                        n_layer=2, pos_rows=48, causal=True, n_experts=4)
    params = init_params(jax.random.PRNGKey(5), moe_cfg)
    gen = Generator(params, moe_cfg, _V({str(i): i for i in range(64)}),
                    eos_token="none", pad_token="0")
    eng = ContinuousBatcher(gen, slots=2, chunk=4, max_len=24)
    try:
        got = eng.submit([1, 2, 3], seed=9, timeout=600)
    finally:
        eng.close()
    prompt = np.zeros((1, 16), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv_ragged(
        params, jnp.asarray(prompt), jnp.asarray([3], np.int32),
        jax.random.PRNGKey(9)[None], moe_cfg, 24,
        temperature=1.0, top_k=50, eos_id=-1, pad_id=0)
    solo_ids = np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()
    assert got == solo_ids


def test_top_p_engine_matches_solo(generator):
    """top_p is engine-wide (compiled into the chunk program) like top_k:
    a nucleus-sampled engine row bit-matches the same request through
    generate_kv_ragged with the same top_p, and a mismatched request is
    rejected at submit while accepts() steers callers to a solo decode."""
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            top_p=0.7)
    try:
        assert eng.accepts(top_p=0.7)
        assert not eng.accepts(top_p=0.9)
        with pytest.raises(ValueError):
            eng.submit([1, 2, 3], seed=7, top_p=0.9)
        got = eng.submit([1, 2, 3], seed=7, timeout=600)
    finally:
        eng.close()
    prompt = np.zeros((1, 16), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv_ragged(
        generator.params, jnp.asarray(prompt), jnp.asarray([3], np.int32),
        jax.random.PRNGKey(7)[None], CFG, 24, temperature=1.0, top_k=50,
        eos_id=-1, pad_id=0, top_p=0.7)
    solo_ids = np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()
    assert got == solo_ids
    # a top-p-restricted stream must differ from the unrestricted one for
    # this seed/geometry (sanity that the mask actually bites)
    assert got != solo(generator, [1, 2, 3], 7, 24)


def test_per_row_top_p_mixed_rows_match_solo(generator):
    """Per-row nucleus mode: every request's top_p rides the engine. A
    top_p=1.0 row must stay bit-exact with the unfiltered solo stream
    (apply_top_p's per-row select), while a top_p=0.7 row in the SAME
    chunk program matches its nucleus-filtered solo stream."""
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            per_row_sampling=True)
    try:
        assert eng.accepts(top_p=0.33) and eng.accepts(top_p=1.0)
        results = {}

        def hit(name, ids, seed, top_p):
            results[name] = eng.submit(ids, seed=seed, top_p=top_p,
                                       timeout=600)

        threads = [
            threading.Thread(target=hit, args=("plain", [1, 2, 3], 7, 1.0),
                             daemon=True),
            threading.Thread(target=hit, args=("nucleus", [4, 5], 9, 0.7),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        eng.close()

    def solo_p(ids, seed, top_p):
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :len(ids)] = ids
        buf, pos = generate_kv_ragged(
            generator.params, jnp.asarray(prompt),
            jnp.asarray([len(ids)], np.int32),
            jax.random.PRNGKey(seed)[None], CFG, 24, temperature=1.0,
            top_k=50, eos_id=-1, pad_id=0, top_p=top_p)
        return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()

    assert results["plain"] == solo_p([1, 2, 3], 7, 1.0)
    assert results["plain"] == solo(generator, [1, 2, 3], 7, 24)
    assert results["nucleus"] == solo_p([4, 5], 9, 0.7)
    assert results["nucleus"] != solo(generator, [4, 5], 9, 24)


def test_per_row_min_p_rides_engine(generator):
    """min-p rides per-row sampling mode: a filtered row joins the shared
    decode and bit-matches its solo stream, while a neutral row in the
    same program stays bit-exact with the unfiltered solo stream. In
    engine-wide mode min_p requests are rejected (accepts() steers to a
    solo decode)."""
    plain_eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24)
    try:
        assert not plain_eng.accepts(min_p=0.2)
        assert plain_eng.accepts(min_p=0.0)
        with pytest.raises(ValueError):
            plain_eng.submit([1, 2, 3], seed=7, min_p=0.2)
    finally:
        plain_eng.close()

    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            per_row_sampling=True)
    try:
        assert eng.accepts(min_p=0.2)
        results = {}

        def hit(name, ids, seed, min_p):
            results[name] = eng.submit(ids, seed=seed, min_p=min_p,
                                       timeout=600)

        threads = [
            threading.Thread(target=hit, args=("plain", [1, 2, 3], 7, 0.0),
                             daemon=True),
            threading.Thread(target=hit, args=("minp", [4, 5], 9, 0.15),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        eng.close()

    def solo_mp(ids, seed, min_p):
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :len(ids)] = ids
        buf, pos = generate_kv_ragged(
            generator.params, jnp.asarray(prompt),
            jnp.asarray([len(ids)], np.int32),
            jax.random.PRNGKey(seed)[None], CFG, 24, temperature=1.0,
            top_k=50, eos_id=-1, pad_id=0, min_p=min_p)
        return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()

    assert results["plain"] == solo(generator, [1, 2, 3], 7, 24)
    assert results["minp"] == solo_mp([4, 5], 9, 0.15)


def test_per_row_penalties_mixed_rows_match_solo(generator):
    """Per-row anti-repetition mode: a penalized row and a plain row share
    one chunk program; the plain row stays bit-exact with its solo stream
    (neutral penalty values are exact no-ops) while the penalized row
    matches its penalized solo run."""
    pen = (1.5, 0.2, 0.3)
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            per_row_sampling=True)
    try:
        assert eng.accepts(penalties=pen)
        results = {}

        def hit(name, ids, seed, p):
            results[name] = eng.submit(ids, seed=seed, penalties=p,
                                       timeout=600)

        threads = [
            threading.Thread(target=hit, args=("plain", [1, 2, 3], 7, None),
                             daemon=True),
            threading.Thread(target=hit, args=("pen", [4, 5], 9, pen),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        eng.close()

    def solo_pen(ids, seed, p):
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :len(ids)] = ids
        buf, pos = generate_kv_ragged(
            generator.params, jnp.asarray(prompt),
            jnp.asarray([len(ids)], np.int32),
            jax.random.PRNGKey(seed)[None], CFG, 24, temperature=1.0,
            top_k=50, eos_id=-1, pad_id=0, penalties=p)
        return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()

    assert results["plain"] == solo(generator, [1, 2, 3], 7, 24)
    assert results["pen"] == solo_pen([4, 5], 9, pen)
    # the penalties actually bite for this seed/geometry
    assert results["pen"] != solo(generator, [4, 5], 9, 24)


def test_plain_engine_rejects_penalties(generator):
    """Engine-wide mode has no penalty state: non-neutral requests are
    rejected (accepts() steers callers to a solo decode); the neutral
    tuple passes through."""
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24)
    try:
        assert not eng.accepts(penalties=(1.5, 0.0, 0.0))
        assert eng.accepts(penalties=(1.0, 0.0, 0.0))
        assert eng.accepts(penalties=None)
        with pytest.raises(ValueError):
            eng.submit([1, 2, 3], seed=7, penalties=(1.5, 0.0, 0.0))
    finally:
        eng.close()


def test_soak_mixed_mode_no_slot_leak(generator):
    """CI-scale twin of benchmarks.py scenario 11 (VERDICT r2 #8): 120
    mixed requests (plain / per-row params / streamed / cancelled /
    greedy) through one engine — every request accounted for, ZERO slot
    leaks, RSS flat."""
    import random
    import threading

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    eng = ContinuousBatcher(generator, slots=4, chunk=8, max_len=32,
                            per_row_sampling=True)
    try:
        eng.submit([1, 2, 3], seed=0, max_len=16)   # compile
        rss0 = rss_mb()
        N = 120
        errors, done = [], [0]
        lock = threading.Lock()

        def one(i):
            try:
                ml = 12 + (i % 3) * 6
                kind = i % 5
                if kind == 0:
                    eng.submit([1, 2, 3], seed=i, max_len=ml)
                elif kind == 1:
                    eng.submit([1, 2, 3], seed=i, max_len=ml, top_p=0.9,
                               temperature=0.8, penalties=(1.2, 0.0, 0.0))
                elif kind == 2:
                    for _ in eng.submit_stream([1, 2, 3], seed=i,
                                               max_len=ml):
                        pass
                elif kind == 3:
                    s = eng.submit_stream([1, 2, 3], seed=i, max_len=ml)
                    next(s, None)
                    s.close()
                else:   # per-row nucleus only
                    eng.submit([1, 2, 3], seed=i, max_len=ml,
                               top_p=0.7)
                with lock:
                    done[0] += 1
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(f"{type(exc).__name__}: {exc}")

        rng = random.Random(0)
        threads = [threading.Thread(target=one, args=(i,), daemon=True)
                   for i in range(N)]
        for t in threads:
            t.start()
            if rng.random() < 0.3:
                import time as _t

                _t.sleep(0.002)
        for t in threads:
            t.join(timeout=600)
        import time as _t

        _t.sleep(0.5)
        assert done[0] == N and not errors, (done[0], errors[:5])
        assert len(eng._free) == 4, "slot leak"
        assert eng.stats["served"] + eng.stats["cancelled"] >= \
            eng.stats["admitted"]
        assert rss_mb() - rss0 < 512, "RSS grew during soak"
    finally:
        eng.close()


def test_run_detached_bit_matches_engine_row(generator):
    """Round 5: the pipeline's idle-engine bypass decodes through the
    engine's OWN compiled programs on a private state
    (ContinuousBatcher.run_detached) — the result must be IDENTICAL to
    submitting the same request to the live engine (any backend; a
    separate one-shot program flips near-tie argmaxes on TPU, §3.6),
    and detached runs must not disturb live engine traffic."""
    from eamg_tpu.serve.continuous import ContinuousBatcher

    eng = ContinuousBatcher(generator, slots=4, chunk=8, max_len=48)
    try:
        for seed, temp, plen in ((0, 1.0, 3), (7, 0.7, 5)):
            prompt = list(range(1, plen + 1))
            via_engine = eng.submit(prompt, temperature=temp, seed=seed)
            detached = eng.run_detached(prompt, temperature=temp,
                                        seed=seed)
            assert detached == via_engine, (seed, detached, via_engine)
        # interleaved: a detached run between two engine submits leaves
        # the engine's own rows untouched
        a = eng.submit([1, 2, 3], seed=11)
        eng.run_detached([4, 5], seed=12)
        b = eng.submit([1, 2, 3], seed=11)
        assert a == b
        # prompt at/over budget: zero generation steps (engine contract)
        long_prompt = list(range(1, 50))
        assert eng.run_detached(long_prompt, seed=0) == long_prompt
    finally:
        eng.close()


def test_run_detached_per_row_sampling_engine(generator):
    """run_detached must also match engine rows on a per-row-sampling
    engine (row top_p/min_p compiled as traced operands)."""
    from eamg_tpu.serve.continuous import ContinuousBatcher

    eng = ContinuousBatcher(generator, slots=4, chunk=8, max_len=48,
                            per_row_sampling=True)
    try:
        prompt = [1, 2, 3]
        for top_p in (1.0, 0.6):
            a = eng.submit(prompt, temperature=0.9, seed=5, top_p=top_p)
            b = eng.run_detached(prompt, temperature=0.9, seed=5,
                                 top_p=top_p)
            assert a == b, (top_p, a, b)
    finally:
        eng.close()
