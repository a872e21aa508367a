"""HF ``no_repeat_ngram_size`` across the decode stack: the sort-free
scatter ban mask (decode/sampling.py::no_repeat_ngram_ban) and its
threading through the KV loop, the uncached loop, the ragged batch, the
chunked stream, and the continuous engine. Beyond-reference capability —
the reference sampler is plain top-k (api_cache.py:171-177)."""

import threading

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator, generate_kv
from eamg_tpu.decode.ragged import generate_kv_ragged
from eamg_tpu.decode.sampling import (apply_no_repeat_ngram,
                                      no_repeat_ngram_ban)
from eamg_tpu.decode.stream import stream_tokens
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.tokenizer import Vocab

jax.config.update("jax_default_matmul_precision", "highest")


def _oracle_banned(hist: list[int], n: int) -> set[int]:
    """Python reference for the HF semantics: tokens c such that
    (hist[-(n-1):] + [c]) is an n-gram already present in hist."""
    if n == 0 or len(hist) < n:
        return set()
    if n == 1:
        return set(hist)
    tail = tuple(hist[-(n - 1):])
    return {hist[j + n - 1] for j in range(len(hist) - n + 1)
            if tuple(hist[j:j + n - 1]) == tail}


def test_ban_mask_matches_oracle():
    rng = np.random.default_rng(0)
    V, L, B = 11, 24, 6           # tiny vocab: repeated n-grams everywhere
    for n in (1, 2, 3, 4):
        buf = rng.integers(0, V, size=(B, L)).astype(np.int32)
        # include the edges: empty history, history shorter than n, full
        pos = np.array([0, 1, n - 1 if n > 1 else 2, n, L // 2, L],
                       np.int32)
        got = np.asarray(no_repeat_ngram_ban(
            jnp.asarray(buf), jnp.asarray(pos), n, V))
        for b in range(B):
            want = _oracle_banned(buf[b, :pos[b]].tolist(), n)
            assert set(np.flatnonzero(got[b]).tolist()) == want, (n, b)


def test_ban_mask_scalar_pos_broadcasts():
    buf = jnp.asarray([[1, 2, 1, 2, 1, 0], [3, 3, 3, 3, 3, 0]], jnp.int32)
    got = np.asarray(no_repeat_ngram_ban(buf, 5, 2, 8))
    # row 0: history 1 2 1 2 1, tail (1); 1->2 twice, so 2 banned
    assert set(np.flatnonzero(got[0]).tolist()) == {2}
    # row 1: 3 3 3 3 3, tail (3); 3->3, so 3 banned
    assert set(np.flatnonzero(got[1]).tolist()) == {3}


def test_apply_row_on_gates_per_row():
    """row_on=False rows are bit-exact no-ops — the continuous engine's
    mixed-traffic contract (plain rows share the compiled chunk with
    banned rows and must match their solo streams)."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    buf = jnp.asarray([[5, 6, 5, 0], [5, 6, 5, 0]], jnp.int32)
    pos = jnp.asarray([3, 3], jnp.int32)
    out = np.asarray(apply_no_repeat_ngram(
        logits, buf, pos, 2, row_on=jnp.asarray([True, False])))
    want = np.asarray(logits)
    assert out[0, 6] <= want[0, 6] - 1e9          # 5->6 banned on row 0
    assert np.array_equal(out[1], want[1])        # row 1 untouched
    # static off returns the same object (compiled out entirely)
    assert apply_no_repeat_ngram(logits, buf, pos, 0) is logits


V, SEQ = 32, 48
CFG = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=32, n_head=4, n_layer=2,
                pos_rows=SEQ, ln_placement="pre", activation="gelu",
                causal=True)


def _gen(causal=True):
    cfg = CFG if causal else GPTConfig(
        vocab_size=V, seq_len=SEQ, d_model=32, n_head=4, n_layer=2,
        pos_rows=SEQ, ln_placement="pre", activation="gelu", causal=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    vocab = Vocab({str(i): i for i in range(V)})
    return Generator(params, cfg, vocab, eos_token="none", pad_token="0")


def _ngrams(seq: list[int], n: int) -> list[tuple]:
    return [tuple(seq[i:i + n]) for i in range(len(seq) - n + 1)]


def test_kv_greedy_never_repeats_ngram():
    """Greedy + no_repeat_ngram=2: every 2-gram in prompt+generation is
    distinct. Plain greedy at this tiny-vocab scale cycles immediately —
    the contrast proves the ban is load-bearing."""
    gen = _gen()
    prompt = [5, 6, 7, 8]
    row = gen.generate_ids(prompt, max_len=40, greedy=True,
                           refeed_last_prompt=False,
                           no_repeat_ngram=2)[0].tolist()
    grams = _ngrams(row, 2)
    assert len(row) == 40
    assert len(set(grams)) == len(grams)
    plain = gen.generate_ids(prompt, max_len=40, greedy=True,
                             refeed_last_prompt=False)[0].tolist()
    pg = _ngrams(plain, 2)
    assert len(set(pg)) < len(pg)      # sanity: unbanned greedy repeats


def test_kv_n1_bans_every_seen_token():
    """n=1 degenerates to an exhaustive no-repeat decode (every token,
    prompt included, appears at most once)."""
    gen = _gen()
    prompt = [1, 2, 3]
    row = gen.generate_ids(prompt, max_len=28, greedy=True,
                           refeed_last_prompt=False,
                           no_repeat_ngram=1)[0].tolist()
    assert len(set(row)) == len(row)


def test_uncached_loop_respects_ban():
    gen = _gen(causal=False)
    row = gen.generate_ids([3, 4], max_len=24, greedy=True, use_cache=False,
                           no_repeat_ngram=2)[0].tolist()
    grams = _ngrams(row, 2)
    assert len(set(grams)) == len(grams)


def test_sampled_reproducible_and_off_equals_default():
    gen = _gen()
    prompt = [9, 10, 11]
    kw = dict(max_len=30, temperature=0.9, top_k=20, seed=3,
              refeed_last_prompt=False)
    a = gen.generate_ids(prompt, no_repeat_ngram=3, **kw)
    b = gen.generate_ids(prompt, no_repeat_ngram=3, **kw)
    assert np.array_equal(a, b)                   # seeded reproducibility
    grams = _ngrams(np.asarray(a)[0].tolist(), 3)
    assert len(set(grams)) == len(grams)          # ban holds under sampling
    off = gen.generate_ids(prompt, **kw)
    zero = gen.generate_ids(prompt, no_repeat_ngram=0, **kw)
    assert np.array_equal(off, zero)              # 0 routes to the ban-free program


def test_ngram_composes_with_penalties():
    """Both history-dependent transforms ride the same loop state."""
    gen = _gen()
    row = gen.generate_ids([5, 6], max_len=30, temperature=1.0, top_k=0,
                           seed=7, refeed_last_prompt=False,
                           penalties=(1.3, 0.1, 0.0),
                           no_repeat_ngram=2)[0].tolist()
    grams = _ngrams(row, 2)
    assert len(set(grams)) == len(grams)


RAGGED_PROMPTS = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10], [11]]


def _ragged_batch(prompts, width=8):
    arr = np.zeros((len(prompts), width), np.int32)
    lens = np.zeros((len(prompts),), np.int32)
    for i, p in enumerate(prompts):
        arr[i, :len(p)] = p
        lens[i] = len(p)
    return jnp.asarray(arr), jnp.asarray(lens)


def test_ragged_ngram_rows_equal_individual_runs():
    """Every ragged row bit-matches its solo generate_kv run with the same
    ban size (per-row tails over per-row lengths)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt, lens = _ragged_batch(RAGGED_PROMPTS)
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(0), CFG, 24,
                                  greedy=True, eos_id=-1, pad_id=0,
                                  no_repeat_ngram=2)
    buf, pos = np.asarray(buf), np.asarray(pos)
    for i, p in enumerate(RAGGED_PROMPTS):
        single = np.zeros((1, 8), np.int32)
        single[0, :len(p)] = p
        ref, ref_pos = generate_kv(params, jnp.asarray(single), len(p),
                                   jax.random.PRNGKey(0), CFG, 24,
                                   greedy=True, eos_id=-1, pad_id=0,
                                   refeed_last_prompt=False,
                                   no_repeat_ngram=2)
        assert buf[i, :int(pos[i])].tolist() == \
            np.asarray(ref)[0, :int(ref_pos)].tolist(), f"row {i}"
        grams = _ngrams(buf[i, :int(pos[i])].tolist(), 2)
        assert len(set(grams)) == len(grams), f"row {i}"


def test_stream_ngram_matches_one_shot():
    """The chunked stream carries the (buf, pos) history state across
    chunk programs and bit-matches the one-shot compiled loop."""
    params = init_params(jax.random.PRNGKey(5), CFG)
    prompt = np.zeros((1, 8), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv(params, jnp.asarray(prompt), 3,
                           jax.random.PRNGKey(0), CFG, 24, eos_id=-1,
                           pad_id=0, greedy=True, refeed_last_prompt=False,
                           no_repeat_ngram=2)
    ref = np.asarray(buf)[0, 3:int(pos)].tolist()
    got = list(stream_tokens(params, CFG, [1, 2, 3], 24, chunk=4,
                             greedy=True, eos_id=-1, no_repeat_ngram=2))
    assert got == ref
    grams = _ngrams([1, 2, 3] + got, 2)
    assert len(set(grams)) == len(grams)
    # sampled path under a different chunking (split-key parity + the
    # history handoff at a partial final chunk)
    buf2, pos2 = generate_kv(params, jnp.asarray(prompt), 3,
                             jax.random.PRNGKey(0), CFG, 24, eos_id=-1,
                             pad_id=0, refeed_last_prompt=False,
                             temperature=1.0, top_k=10, no_repeat_ngram=3)
    ref2 = np.asarray(buf2)[0, 3:int(pos2)].tolist()
    got2 = list(stream_tokens(params, CFG, [1, 2, 3], 24, chunk=5,
                              temperature=1.0, top_k=10, eos_id=-1,
                              seed=0, no_repeat_ngram=3))
    assert got2 == ref2


def test_continuous_engine_ngram_mixed_rows_match_solo():
    """An engine compiled with a ban size serves banned and plain rows in
    the same chunk program: the banned row matches its banned solo run,
    the plain row stays bit-exact with its plain solo stream (row_on
    gating), and mismatched ban sizes are rejected up front."""
    from eamg_tpu.serve.continuous import ContinuousBatcher

    params = init_params(jax.random.PRNGKey(0), CFG)
    gen = Generator(params, CFG, Vocab({str(i): i for i in range(V)}),
                    eos_token="none", pad_token="0")
    eng = ContinuousBatcher(gen, slots=2, chunk=4, max_len=24,
                            no_repeat_ngram=2)
    try:
        assert eng.accepts(no_repeat_ngram=2)
        assert not eng.accepts(no_repeat_ngram=3)
        assert eng.accepts(no_repeat_ngram=0)     # plain rows ride along
        results = {}

        def hit(name, ids, seed, n):
            results[name] = eng.submit(ids, seed=seed, no_repeat_ngram=n,
                                       timeout=600)

        threads = [
            threading.Thread(target=hit, args=("ban", [1, 2, 3], 7, 2),
                             daemon=True),
            threading.Thread(target=hit, args=("plain", [4, 5], 9, 0),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        import pytest
        with pytest.raises(ValueError):
            eng.submit([1, 2], no_repeat_ngram=3)
    finally:
        eng.close()

    def solo(ids, seed, n):
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :len(ids)] = ids
        buf, pos = generate_kv_ragged(
            gen.params, jnp.asarray(prompt),
            jnp.asarray([len(ids)], np.int32),
            jax.random.PRNGKey(seed)[None], CFG, 24, temperature=1.0,
            top_k=50, eos_id=-1, pad_id=0, no_repeat_ngram=n)
        return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()

    assert results["ban"] == solo([1, 2, 3], 7, 2)
    assert results["plain"] == solo([4, 5], 9, 0)
    # the ban actually bites for this seed/geometry
    assert results["ban"] != solo([1, 2, 3], 7, 0)
    grams = _ngrams(results["ban"], 2)
    assert len(set(grams)) == len(grams)


def test_plain_engine_rejects_ngram_requests():
    from eamg_tpu.serve.continuous import ContinuousBatcher
    import pytest

    params = init_params(jax.random.PRNGKey(0), CFG)
    gen = Generator(params, CFG, Vocab({str(i): i for i in range(V)}),
                    eos_token="none", pad_token="0")
    eng = ContinuousBatcher(gen, slots=2, chunk=4, max_len=24)
    try:
        assert not eng.accepts(no_repeat_ngram=2)
        with pytest.raises(ValueError):
            eng.submit([1, 2], no_repeat_ngram=2)
    finally:
        eng.close()
