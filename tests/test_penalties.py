"""Anti-repetition sampling controls: repetition / frequency / presence
penalties (decode/sampling.py::apply_penalties, counts threaded through the
compiled decode loops). Beyond-reference capability — the reference sampler
is plain top-k (api_cache.py:171-177)."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator, generate_kv
from eamg_tpu.decode.sampling import (apply_penalties, sample_token,
                                      token_counts)
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.tokenizer import Vocab

jax.config.update("jax_default_matmul_precision", "highest")

V, SEQ, D, H, L = 97, 32, 64, 4, 2


def _np_penalties(logits, counts, rp, fp, pp):
    """Numpy oracle: HF CTRL repetition penalty + OpenAI freq/presence."""
    out = logits.copy()
    present = counts > 0
    pen = np.where(logits < 0, logits * rp, logits / rp)
    out = np.where(present, pen, out)
    return out - fp * counts - pp * present.astype(np.float32)


def test_apply_penalties_matches_oracle():
    rng = np.random.default_rng(0)
    logits = (rng.normal(size=(4, 50)) * 3).astype(np.float32)
    counts = rng.integers(0, 4, size=(4, 50)).astype(np.float32)
    for rp, fp, pp in [(1.3, 0.0, 0.0), (1.0, 0.7, 0.0), (1.0, 0.0, 1.1),
                       (2.0, 0.5, 0.25), (0.8, 0.0, 0.0)]:
        got = np.asarray(apply_penalties(jnp.asarray(logits),
                                         jnp.asarray(counts), rp, fp, pp))
        want = _np_penalties(logits, counts, rp, fp, pp)
        assert np.allclose(got, want, atol=1e-6), (rp, fp, pp)


def test_apply_penalties_neutral_is_bit_exact_noop():
    """Neutral values (1, 0, 0) are exact no-ops even when TRACED — the
    per-row mixed-traffic contract (a plain row in a penalized batch must
    bit-match its solo stream) depends on this."""
    rng = np.random.default_rng(1)
    x_np = (rng.normal(size=(3, 40)) * 5).astype(np.float32)
    x = jnp.asarray(x_np)
    counts = jnp.asarray(rng.integers(0, 3, size=(3, 40)), jnp.float32)
    # static off: same object back
    assert apply_penalties(x, counts) is x
    assert apply_penalties(x, counts, 1.0, 0.0, 0.0) is x
    # traced neutral: bit-exact
    traced = jax.jit(
        lambda lg, c, r, f, p: apply_penalties(lg, c, r, f, p, enabled=True)
    )(x, counts, 1.0, 0.0, 0.0)
    assert np.array_equal(np.asarray(traced), x_np)
    # rp <= 0 is clamped (no division by zero / sign flip blowup)
    bad = np.asarray(apply_penalties(x, counts, 0.0, 0.0, 0.0,
                                     enabled=True))
    assert np.isfinite(bad).all()


def test_token_counts_matches_bincount():
    ids = np.array([[3, 3, 7, 0, 0], [1, 2, 3, 4, 4]], np.int32)
    valid = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    got = np.asarray(token_counts(jnp.asarray(ids), jnp.asarray(valid), 10))
    for b in range(2):
        want = np.bincount(ids[b][valid[b]], minlength=10)
        assert np.array_equal(got[b], want), b


def test_sample_token_penalties_restrict_support():
    """Huge presence penalty: tokens with count > 0 can never be drawn."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray((rng.normal(size=(1, 60)) * 4), jnp.float32)
    counts = jnp.zeros((1, 60), jnp.float32).at[0, ::2].set(1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    toks = np.asarray(jax.vmap(
        lambda k: sample_token(k, logits, 1.0, 0, counts=counts,
                               presence_penalty=1e9)[0])(keys))
    assert (toks % 2 == 1).all()      # every even-id token was penalized


def _gen(causal=True):
    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, pos_rows=SEQ, ln_placement="pre",
                    activation="gelu", causal=causal)
    params = init_params(jax.random.PRNGKey(0), cfg)
    vocab = Vocab({str(i): i for i in range(V)})
    return Generator(params, cfg, vocab, eos_token="none", pad_token="0")


def test_presence_penalty_gives_all_distinct_tokens_kv():
    """Greedy + huge presence penalty == exhaustive no-repeat decode: every
    generated token is distinct AND absent from the prompt (counts are
    seeded from the prompt). Without penalties greedy repeats immediately
    at this scale — the contrast is the feature working end to end."""
    gen = _gen()
    prompt = [5, 6, 7, 8]
    row = gen.generate_ids(prompt, max_len=28, greedy=True,
                           refeed_last_prompt=False,
                           penalties=(1.0, 0.0, 1e9))[0]
    out = row[len(prompt):]
    assert len(out) == 24
    assert len(set(out.tolist())) == 24          # all distinct
    assert not (set(out.tolist()) & set(prompt))  # prompt never repeated
    # plain greedy DOES repeat (sanity contrast: the penalty is load-bearing)
    plain = gen.generate_ids(prompt, max_len=28, greedy=True,
                             refeed_last_prompt=False)[0][len(prompt):]
    assert len(set(plain.tolist())) < 24


def test_presence_penalty_all_distinct_uncached():
    gen = _gen(causal=False)
    prompt = [3, 4]
    row = gen.generate_ids(prompt, max_len=20, greedy=True, use_cache=False,
                           penalties=(1.0, 0.0, 1e9))[0]
    out = row[len(prompt):]
    assert len(set(out.tolist())) == len(out)
    assert not (set(out.tolist()) & set(prompt))


def test_frequency_penalty_bounds_repeats():
    """freq=1e9 forbids any second occurrence under sampling too."""
    gen = _gen()
    prompt = [1, 2]
    row = gen.generate_ids(prompt, max_len=24, temperature=1.0, top_k=50,
                           seed=7, refeed_last_prompt=False,
                           penalties=(1.0, 1e9, 0.0))[0]
    full = row.tolist()
    assert len(set(full)) == len(full)


def test_penalties_sampled_reproducible_and_neutral_equals_off():
    gen = _gen()
    prompt = [9, 10, 11]
    kw = dict(max_len=24, temperature=0.9, top_k=20, seed=3,
              refeed_last_prompt=False)
    a = gen.generate_ids(prompt, penalties=(1.4, 0.1, 0.1), **kw)
    b = gen.generate_ids(prompt, penalties=(1.4, 0.1, 0.1), **kw)
    assert np.array_equal(a, b)                  # seeded reproducibility
    # the neutral tuple routes to the penalty-free program (same stream)
    off = gen.generate_ids(prompt, **kw)
    neut = gen.generate_ids(prompt, penalties=(1.0, 0.0, 0.0), **kw)
    assert np.array_equal(off, neut)
    # and an active penalty actually changes the sampled stream
    assert not np.array_equal(np.asarray(a), np.asarray(off))


RAGGED_CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4,
                       n_layer=2, pos_rows=48, causal=True)
RAGGED_PROMPTS = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10], [11]]


def _ragged_batch(prompts, width=8):
    arr = np.zeros((len(prompts), width), np.int32)
    lens = np.zeros((len(prompts),), np.int32)
    for i, p in enumerate(prompts):
        arr[i, :len(p)] = p
        lens[i] = len(p)
    return jnp.asarray(arr), jnp.asarray(lens)


def test_ragged_penalties_rows_equal_individual_runs():
    """Greedy + penalties through the ragged path: every row bit-matches
    its own solo generate_kv run with the same penalties (counts are per
    row, penalty params batch-wide)."""
    from eamg_tpu.decode.ragged import generate_kv_ragged

    pen = (1.7, 0.3, 0.4)
    params = init_params(jax.random.PRNGKey(0), RAGGED_CFG)
    prompt, lens = _ragged_batch(RAGGED_PROMPTS)
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(0), RAGGED_CFG, 24,
                                  greedy=True, eos_id=-1, pad_id=0,
                                  penalties=pen)
    buf, pos = np.asarray(buf), np.asarray(pos)
    for i, p in enumerate(RAGGED_PROMPTS):
        single = np.zeros((1, 8), np.int32)
        single[0, :len(p)] = p
        ref, ref_pos = generate_kv(params, jnp.asarray(single), len(p),
                                   jax.random.PRNGKey(0), RAGGED_CFG, 24,
                                   greedy=True, eos_id=-1, pad_id=0,
                                   refeed_last_prompt=False, penalties=pen)
        assert buf[i, :int(pos[i])].tolist() == \
            np.asarray(ref)[0, :int(ref_pos)].tolist(), f"row {i}"


def test_ragged_presence_penalty_no_repeats_per_row():
    from eamg_tpu.decode.ragged import generate_kv_ragged

    params = init_params(jax.random.PRNGKey(0), RAGGED_CFG)
    prompt, lens = _ragged_batch(RAGGED_PROMPTS)
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(3), RAGGED_CFG, 20,
                                  temperature=1.0, top_k=0, eos_id=-1,
                                  pad_id=0, penalties=(1.0, 0.0, 1e9))
    buf, pos = np.asarray(buf), np.asarray(pos)
    for i in range(len(RAGGED_PROMPTS)):
        row = buf[i, :int(pos[i])].tolist()
        assert len(set(row)) == len(row), f"row {i} repeated a token"


def test_window_batcher_groups_and_applies_penalties():
    """Mixed traffic through the window batcher: penalized and plain
    requests group into separate compiled calls; each result equals its
    solo run."""
    from eamg_tpu.serve.batcher import RequestBatcher
    from eamg_tpu.tokenizer import Vocab

    params = init_params(jax.random.PRNGKey(0), RAGGED_CFG)
    vocab = Vocab({str(i): i for i in range(64)})
    gen = Generator(params, RAGGED_CFG, vocab, eos_token="none",
                    pad_token="0")
    b = RequestBatcher(gen, max_batch=4, window_ms=40.0, max_len=24)
    try:
        import threading

        results = {}

        def run(name, **kw):
            results[name] = b.submit([1, 2, 3], greedy=True, seed=0,
                                     max_len=24, **kw)

        ts = [threading.Thread(target=run, args=("pen",),
                               kwargs={"penalties": (1.0, 0.0, 1e9)}),
              threading.Thread(target=run, args=("plain",))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        solo_pen = gen.generate_ids([1, 2, 3], max_len=24, greedy=True,
                                    refeed_last_prompt=False,
                                    penalties=(1.0, 0.0, 1e9))[0].tolist()
        solo_plain = gen.generate_ids([1, 2, 3], max_len=24, greedy=True,
                                      refeed_last_prompt=False)[0].tolist()
        assert results["pen"] == solo_pen
        assert results["plain"] == solo_plain
        assert results["pen"] != results["plain"]
    finally:
        b.close()


def test_repetition_penalty_discourages_loop():
    """rep penalty > 1 strictly reduces the count of the most-repeated
    token vs the unpenalized greedy stream on the same model."""
    gen = _gen()
    prompt = [5, 6, 7, 8]
    plain = gen.generate_ids(prompt, max_len=SEQ, greedy=True,
                             refeed_last_prompt=False)[0][len(prompt):]
    pen = gen.generate_ids(prompt, max_len=SEQ, greedy=True,
                           refeed_last_prompt=False,
                           penalties=(5.0, 0.0, 0.0))[0][len(prompt):]

    def max_count(arr):
        return int(np.bincount(arr, minlength=V).max())

    assert max_count(pen) <= max_count(plain)
    assert max_count(pen) < len(pen)  # not a single-token loop
