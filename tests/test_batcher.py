"""Request coalescing: concurrent submits group into one device call yet
return exactly the stream each request would produce alone."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator
from eamg_tpu.decode.ragged import generate_kv_ragged
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.serve.batcher import RequestBatcher
from eamg_tpu.tokenizer import Vocab

CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
                pos_rows=48, causal=True)


@pytest.fixture(scope="module")
def generator():
    params = init_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, Vocab({str(i): i for i in range(64)}),
                     eos_token="none", pad_token="0")


def solo(generator, prompt_ids, seed, max_len=24):
    prompt = np.zeros((1, 16), np.int32)
    prompt[0, :len(prompt_ids)] = prompt_ids
    buf, pos = generate_kv_ragged(
        generator.params, jnp.asarray(prompt),
        jnp.asarray([len(prompt_ids)], np.int32),
        jax.random.PRNGKey(seed)[None], CFG, max_len, temperature=1.0,
        top_k=50, eos_id=-1, pad_id=0)
    return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()


def test_concurrent_submits_coalesce_and_match_solo(generator):
    batcher = RequestBatcher(generator, max_batch=4, window_ms=200,
                             max_len=24)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    seeds = [11, 22, 33, 44]
    results = [None] * 4

    def hit(i):
        results[i] = batcher.submit(prompts[i], seed=seeds[i])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)

    for i in range(4):
        assert results[i] == solo(generator, prompts[i], seeds[i]), i
    assert batcher.stats["requests"] == 4
    assert batcher.stats["max_group"] >= 2  # actually coalesced


def test_single_submit_works(generator):
    batcher = RequestBatcher(generator, max_batch=4, window_ms=5,
                             max_len=20)
    out = batcher.submit([3, 4, 5], seed=9)
    assert out == solo(generator, [3, 4, 5], 9, max_len=20)


def test_mixed_params_split_groups(generator):
    batcher = RequestBatcher(generator, max_batch=4, window_ms=150,
                             max_len=20)
    results = {}

    def hit(name, **kw):
        results[name] = batcher.submit([1, 2], seed=5, **kw)

    threads = [threading.Thread(target=hit, args=("a",),
                                kwargs=dict(greedy=True)),
               threading.Thread(target=hit, args=("b",),
                                kwargs=dict(temperature=0.7))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results["a"]) > 2 and len(results["b"]) > 2
    assert results["a"] != results["b"]


def test_full_budget_prompt_still_generates(generator):
    """A prompt that consumes its whole per-request budget is truncated to
    leave one generation slot (ADVICE r1): the result is prompt[:ml-1] plus
    at least one generated token, never a corrupted prompt tail."""
    batcher = RequestBatcher(generator, max_batch=2, window_ms=5,
                             max_len=32)
    prompt = list(range(1, 13))          # 12 tokens, budget 12
    out = batcher.submit(prompt, seed=1, max_len=12, greedy=True)
    assert out[:11] == prompt[:11]
    assert len(out) == 12                # 11 prompt + 1 generated


def test_batcher_caps_max_len_at_pos_table(generator):
    # CFG has pos_rows == seq_len == 48, so n_pos == 48; a config without
    # pos_rows would cap at seq_len-1.
    cfg = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4,
                    n_layer=2, causal=True)  # n_pos = 47
    params = init_params(jax.random.PRNGKey(0), cfg)
    gen = Generator(params, cfg, generator.vocab, eos_token="none",
                    pad_token="0")
    batcher = RequestBatcher(gen, max_batch=2, window_ms=5)
    assert batcher.max_len == 47
    out = batcher.submit([1, 2, 3], seed=0, greedy=True)  # must not crash
    assert len(out) <= 47


def test_per_request_max_len(generator):
    batcher = RequestBatcher(generator, max_batch=4, window_ms=150,
                             max_len=32)
    results = {}

    def hit(name, ml):
        results[name] = batcher.submit([1, 2], seed=3, max_len=ml)

    threads = [threading.Thread(target=hit, args=("short", 10)),
               threading.Thread(target=hit, args=("long", 30))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results["short"]) <= 10
    assert len(results["long"]) > 10


def test_overlength_prompt_returns_prompt_unchanged(generator):
    """Reference zero-generation-steps semantics (api_cache.py:166), same
    contract as generate_ids / ContinuousBatcher / stream_tokens."""
    from eamg_tpu.serve.batcher import RequestBatcher

    b = RequestBatcher(generator, max_batch=2, max_len=16)
    prompt = list(range(1, 20))
    assert b.submit(prompt, seed=0) == prompt
