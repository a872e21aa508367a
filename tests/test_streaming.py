"""Streaming generation: engine-level submit_stream, pipeline
generate_stream events, and the SSE HTTP route.

The reference client saw nothing until the full WAV arrived
(api_cache.py:186-241); the streaming path delivers the emotion/mapping
meta before any decode and token deltas per compiled chunk, bit-identical
to the non-streaming result."""

import base64
import json
import threading
import urllib.parse
import urllib.request

import pytest

import jax

from eamg_tpu.decode import Generator
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.serve import (demo_pipeline, make_server,
                            serve_forever_in_thread)
from eamg_tpu.serve.continuous import ContinuousBatcher
from eamg_tpu.tokenizer import Vocab

CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
                pos_rows=48, causal=True)


@pytest.fixture(scope="module")
def generator():
    params = init_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, Vocab({str(i): i for i in range(64)}),
                     eos_token="none", pad_token="0")


def test_submit_stream_matches_submit(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24)
    try:
        full = eng.submit([1, 2, 3], seed=7)
        deltas = list(eng.submit_stream([1, 2, 3], seed=7))
        assert len(deltas) >= 2, "tokens must arrive incrementally"
        flat = [t for d in deltas for t in d]
        assert [1, 2, 3] + flat == full
    finally:
        eng.close()


def test_submit_stream_while_other_row_decodes(generator):
    """A streaming row that joins while another row decodes still
    bit-matches its solo result (engine row-independence contract)."""
    eng = ContinuousBatcher(generator, slots=2, chunk=2, max_len=32)
    try:
        solo_result = eng.submit([5, 6], seed=3)
        results = {}

        def long_req():
            results["long"] = eng.submit([9], seed=1)

        t = threading.Thread(target=long_req, daemon=True)
        t.start()
        flat = [tok for d in eng.submit_stream([5, 6], seed=3) for tok in d]
        t.join(timeout=600)
        assert [5, 6] + flat == solo_result
        assert "long" in results
    finally:
        eng.close()


def test_submit_stream_overlength_prompt_streams_nothing(generator):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16)
    try:
        assert list(eng.submit_stream(list(range(1, 17)), seed=0)) == []
    finally:
        eng.close()


def _collect(events):
    evs = list(events)
    assert evs[0]["event"] == "meta"
    assert evs[-1]["event"] == "done"
    return evs


def test_generate_stream_solo_events_and_reproducible():
    pipe = demo_pipeline(seq_len=64, d_model=64)
    evs = _collect(pipe.generate_stream("a calm and peaceful melody",
                                        seed=5, render_audio=False))
    toks = [t for e in evs if e["event"] == "tokens" for t in e["texts"]]
    done = evs[-1]
    assert done["n_tokens"] == len(evs[0]["prompt_tokens"]) + len(toks)
    assert base64.b64decode(done["midi_b64"])[:4] == b"MThd"
    assert done["wav_b64"] is None
    evs2 = _collect(pipe.generate_stream("a calm and peaceful melody",
                                         seed=5, render_audio=False))
    toks2 = [t for e in evs2 if e["event"] == "tokens" for t in e["texts"]]
    assert toks == toks2


def test_generate_stream_continuous_matches_generate():
    """Streamed tokens through the continuous engine equal the
    non-streaming generate() result for the same seed."""
    pipe = demo_pipeline(corrected=True, coalesce="continuous")
    try:
        r = pipe.generate("an epic victorious anthem", seed=9,
                          render_audio=False)
        evs = _collect(pipe.generate_stream("an epic victorious anthem",
                                            seed=9, render_audio=False))
        toks = [t for e in evs if e["event"] == "tokens"
                for t in e["texts"]]
        assert evs[0]["prompt_tokens"] + toks == r.tokens
        assert evs[0]["label"] == r.label
    finally:
        pipe.batcher.close()


def test_generate_stream_sections():
    pipe = demo_pipeline(seq_len=64, d_model=64)
    evs = _collect(pipe.generate_stream(
        "I am so happy today. That noise is terrifying.", seed=3,
        sections=True, render_audio=False))
    metas = [e for e in evs if e["event"] == "meta"]
    assert len(metas) == 2
    assert metas[0]["n_sections"] == 2
    assert metas[0]["section"] == 0 and metas[1]["section"] == 1
    assert " / " in evs[-1]["label"]


def test_http_generate_stream_sse():
    pipe = demo_pipeline(seq_len=64, d_model=64)
    srv = make_server(pipe, "127.0.0.1", 0)
    serve_forever_in_thread(srv)
    try:
        port = srv.server_address[1]
        url = f"http://127.0.0.1:{port}/generate?stream=1&format=midi"
        data = urllib.parse.urlencode(
            {"prompt": "a joyful dance", "seed": 4}).encode()
        req = urllib.request.Request(
            url, data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            body = resp.read().decode()
        events = [json.loads(line[len("data: "):])
                  for line in body.split("\n\n")
                  if line.startswith("data: ")]
        assert events[0]["event"] == "meta"
        assert any(e["event"] == "tokens" for e in events)
        assert events[-1]["event"] == "done"
        assert base64.b64decode(events[-1]["midi_b64"])[:4] == b"MThd"
        assert events[-1]["wav_b64"] is None  # format=midi skips render
    finally:
        srv.shutdown()
