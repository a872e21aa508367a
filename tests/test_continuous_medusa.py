"""Per-row medusa inside the continuous engine (VERDICT r3 #3):
medusa rows bit-match their solo generate_medusa stream, plain rows in
the SAME chunks keep the bit-match-solo contract, and mixed traffic
flows through one engine."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator
from eamg_tpu.decode.medusa import generate_medusa, init_medusa_heads
from eamg_tpu.decode.ragged import generate_kv_ragged
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.serve.continuous import ContinuousBatcher
from eamg_tpu.tokenizer import Vocab

CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
                pos_rows=48, causal=True)
GAMMA = 3


@pytest.fixture(scope="module")
def generator():
    params = init_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, Vocab({str(i): i for i in range(64)}),
                     eos_token="none", pad_token="0")


@pytest.fixture(scope="module")
def heads():
    """Random (non-zero) heads so proposals genuinely accept AND reject
    — zero-init heads would make every proposal the base argmax."""
    h = init_medusa_heads(jax.random.PRNGKey(7), CFG, GAMMA)
    rng = np.random.RandomState(3)
    return {"blocks": [
        {"w": jnp.asarray(rng.normal(0, 0.05, b["w"].shape), jnp.float32),
         "b": jnp.asarray(rng.normal(0, 0.01, b["b"].shape), jnp.float32)}
        for b in h["blocks"]]}


def solo_medusa(generator, heads, prompt_ids, seed, max_len,
                temperature=1.0, greedy=False):
    prompt = np.zeros((1, 16), np.int32)
    prompt[0, :len(prompt_ids)] = prompt_ids
    buf, pos, _ = generate_medusa(
        generator.params, heads, jnp.asarray(prompt),
        jnp.asarray(len(prompt_ids), jnp.int32), jax.random.PRNGKey(seed),
        CFG, max_len, gamma=GAMMA, temperature=temperature, top_k=50,
        eos_id=-1, pad_id=0, greedy=greedy)
    return np.asarray(buf)[0, :int(np.asarray(pos))].tolist()


def solo_plain(generator, prompt_ids, seed, max_len, temperature=1.0):
    prompt = np.zeros((1, 16), np.int32)
    prompt[0, :len(prompt_ids)] = prompt_ids
    buf, pos = generate_kv_ragged(
        generator.params, jnp.asarray(prompt),
        jnp.asarray([len(prompt_ids)], np.int32),
        jax.random.PRNGKey(seed)[None], CFG, max_len,
        temperature=temperature, top_k=50, eos_id=-1, pad_id=0)
    return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()


def test_medusa_row_matches_solo_sampled(generator, heads):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            medusa_heads=heads)
    try:
        for seed, prompt in ((11, [1, 2, 3]), (22, [4, 5])):
            got = eng.submit(prompt, seed=seed, medusa=True)
            want = solo_medusa(generator, heads, prompt, seed,
                               eng.max_len)
            assert got == want, (seed, got, want)
    finally:
        eng.close()


def test_medusa_row_matches_solo_greedy(generator, heads):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            greedy=True, medusa_heads=heads)
    try:
        got = eng.submit([3, 1, 4], seed=9, medusa=True)
        want = solo_medusa(generator, heads, [3, 1, 4], 9, eng.max_len,
                           greedy=True)
        assert got == want
        # greedy medusa == greedy plain stream (acceptance exactness)
        plain = ContinuousBatcher(generator, slots=2, chunk=4,
                                  max_len=eng.max_len, greedy=True)
        try:
            assert plain.submit([3, 1, 4], seed=9) == got
        finally:
            plain.close()
    finally:
        eng.close()


def test_mixed_traffic_each_row_matches_solo(generator, heads):
    """2 medusa + 2 plain rows decode CONCURRENTLY through one engine;
    every row bit-matches its own solo stream (the VERDICT r3 #3 done
    criterion)."""
    eng = ContinuousBatcher(generator, slots=4, chunk=4, max_len=24,
                            medusa_heads=heads)
    try:
        reqs = [([1, 2, 3], 11, True), ([4, 5], 22, False),
                ([6, 7, 8, 9], 33, True), ([10], 44, False)]
        results = [None] * 4

        def hit(i):
            p, s, m = reqs[i]
            results[i] = eng.submit(p, seed=s, medusa=m)

        threads = [threading.Thread(target=hit, args=(i,), daemon=True)
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i, (p, s, m) in enumerate(reqs):
            want = (solo_medusa(generator, heads, p, s, eng.max_len)
                    if m else solo_plain(generator, p, s, eng.max_len))
            assert results[i] == want, (i, m, results[i], want)
        assert eng.stats["served"] == 4
    finally:
        eng.close()


def test_medusa_stream_deltas_match_submit(generator, heads):
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            medusa_heads=heads)
    try:
        whole = eng.submit([2, 4, 6], seed=5, medusa=True)
        deltas = []
        for delta in eng.submit_stream([2, 4, 6], seed=5, medusa=True):
            deltas.extend(delta)
        assert [2, 4, 6] + deltas == whole
    finally:
        eng.close()


def test_medusa_validation(generator, heads):
    plain = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24)
    try:
        assert not plain.accepts(medusa=True)
        with pytest.raises(ValueError, match="without medusa heads"):
            plain.submit([1, 2], medusa=True)
    finally:
        plain.close()
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            per_row_sampling=True, medusa_heads=heads)
    try:
        assert eng.accepts(medusa=True)
        with pytest.raises(ValueError, match="medusa rows reject"):
            eng.submit([1, 2], medusa=True,
                       penalties=(1.2, 0.0, 0.0))
    finally:
        eng.close()


def test_plain_traffic_uses_plain_program(generator, heads):
    """A medusa-enabled engine serving only plain rows must still
    bit-match solo plain streams (it routes them through the plain
    chunk program — no premium, no drift)."""
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            medusa_heads=heads)
    try:
        got = eng.submit([1, 2, 3], seed=11)
        assert got == solo_plain(generator, [1, 2, 3], 11, eng.max_len)
    finally:
        eng.close()


def test_medusa_row_with_top_p_matches_solo(generator, heads):
    """Per-row-sampling engine: a medusa row with top_p=0.9 bit-matches
    solo generate_medusa(top_p=0.9) — the traced-filter _medusa_dist
    path equals the solo static-filter _dist path."""
    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=24,
                            per_row_sampling=True, medusa_heads=heads)
    try:
        got = eng.submit([1, 2, 3], seed=13, medusa=True, top_p=0.9)
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :3] = [1, 2, 3]
        buf, pos, _ = generate_medusa(
            generator.params, heads, jnp.asarray(prompt),
            jnp.asarray(3, jnp.int32), jax.random.PRNGKey(13), CFG,
            eng.max_len, gamma=GAMMA, temperature=1.0, top_k=50,
            eos_id=-1, pad_id=0, top_p=0.9)
        want = np.asarray(buf)[0, :int(np.asarray(pos))].tolist()
        assert got == want
    finally:
        eng.close()


def test_fail_all_preserves_medusa_state_shape(generator, heads,
                                               monkeypatch):
    """Round-5 regression (review finding): _fail_all must rebuild the
    engine state WITH the medusa fields on a medusa-capable engine —
    without them the next medusa row KeyErrors on state['h_last'] and
    every later request re-fails; even plain rows would retrace against
    a different pytree (fresh compile + cross-program numerics)."""
    import pytest

    import eamg_tpu.serve.continuous as cont
    from eamg_tpu.serve.continuous import ContinuousBatcher

    eng = ContinuousBatcher(generator, slots=2, chunk=4, max_len=16,
                            medusa_heads=heads)
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
        # recovered state still carries the medusa fields
        assert "h_last" in eng.state and "med_on" in eng.state
        # a medusa row AND a plain row both serve after the failure
        got_m = eng.submit([1, 2], seed=3, timeout=120, medusa=True)
        assert len(got_m) > 2
        got_p = eng.submit([3, 4], seed=2, timeout=120)
        assert len(got_p) > 2
    finally:
        eng.close()
