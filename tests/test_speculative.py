"""Speculative decoding correctness.

The load-bearing invariant: greedy speculative output is BIT-IDENTICAL to
target-only greedy decoding for ANY draft model (matching drafts are
accepted, mismatches resampled to the target argmax). Sampled mode is
checked for distribution preservation statistically on a tiny vocab.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.decode.speculative import generate_speculative
from eamg_tpu.models import GPTConfig, decode_block, decode_step, \
    init_kv_cache, init_params, prefill

V = 32
T_KW = dict(vocab_size=V, seq_len=64, d_model=32, n_head=4, n_layer=2,
            pos_rows=64, causal=True)
D_KW = dict(vocab_size=V, seq_len=64, d_model=16, n_head=2, n_layer=1,
            pos_rows=64, causal=True)


def models(seed_t=0, seed_d=1):
    cfg_t, cfg_d = GPTConfig(**T_KW), GPTConfig(**D_KW)
    return (init_params(jax.random.PRNGKey(seed_t), cfg_t), cfg_t,
            init_params(jax.random.PRNGKey(seed_d), cfg_d), cfg_d)


def test_decode_block_matches_stepwise():
    """decode_block over G tokens == G sequential decode_steps."""
    params, cfg, _, _ = models()
    prompt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    cache_a = init_kv_cache(cfg, 1, 32)
    _, cache_a = prefill(params, prompt, cfg, cache_a, prompt_len=3)
    cache_b = jax.tree.map(lambda x: x, cache_a)

    block = jnp.asarray([[5, 6, 7]], jnp.int32)
    logits_blk, cache_a = decode_block(params, block, cache_a, cfg)

    outs = []
    for i in range(3):
        lg, cache_b = decode_step(params, block[:, i:i + 1], cache_b, cfg)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.asarray(logits_blk[0]),
                               np.concatenate(outs, 0), atol=1e-4,
                               rtol=1e-4)
    assert int(cache_a["length"]) == int(cache_b["length"]) == 6


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_greedy_speculative_equals_target_greedy(gamma):
    params_t, cfg_t, params_d, cfg_d = models()
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    ref, ref_pos = generate_kv(params_t, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg_t, 24,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    got, pos = generate_speculative(params_t, params_d,
                                    jnp.asarray(prompt), 3,
                                    jax.random.PRNGKey(0), cfg_t, cfg_d,
                                    24, gamma=gamma, greedy=True,
                                    eos_id=-1, pad_id=0)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    assert int(pos) == int(ref_pos)


def test_greedy_speculative_self_draft():
    """Draft == target: every proposal accepted, still identical output."""
    params_t, cfg_t, _, _ = models()
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [4, 5, 6]
    ref, _ = generate_kv(params_t, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg_t, 20, greedy=True,
                         eos_id=-1, pad_id=0, refeed_last_prompt=False)
    got, _ = generate_speculative(params_t, params_t, jnp.asarray(prompt),
                                  3, jax.random.PRNGKey(0), cfg_t, cfg_t,
                                  20, gamma=4, greedy=True, eos_id=-1,
                                  pad_id=0)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()


def test_speculative_eos_stops():
    params_t, cfg_t, params_d, cfg_d = models(seed_t=2)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    ref, _ = generate_kv(params_t, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg_t, 24, greedy=True,
                         eos_id=-1, pad_id=0, refeed_last_prompt=False)
    eos = int(np.asarray(ref)[0, 5])  # make the 3rd generated token EOS
    got, pos = generate_speculative(params_t, params_d,
                                    jnp.asarray(prompt), 3,
                                    jax.random.PRNGKey(0), cfg_t, cfg_d,
                                    24, gamma=3, greedy=True, eos_id=eos,
                                    pad_id=0)
    row = np.asarray(got)[0, :int(pos)]
    assert row[-1] == eos
    assert eos not in row[3:-1]
    # matches target-only generation with the same eos
    ref2, pos2 = generate_kv(params_t, jnp.asarray(prompt), 3,
                             jax.random.PRNGKey(0), cfg_t, 24, greedy=True,
                             eos_id=eos, pad_id=0,
                             refeed_last_prompt=False)
    assert row.tolist() == np.asarray(ref2)[0, :int(pos2)].tolist()


def test_sampled_distribution_preserved():
    """First generated token over many seeds ~ target-only distribution.
    chi-square-lite: empirical frequencies within tolerance."""
    params_t, cfg_t, params_d, cfg_d = models(seed_t=3, seed_d=4)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [7, 8, 9]
    pj = jnp.asarray(prompt)
    n = 400

    # Reference first-token distribution: the prefill logits distribution
    from eamg_tpu.decode.speculative import _dist
    cache = init_kv_cache(cfg_t, 1, 16)
    logits0, _ = prefill(params_t, pj, cfg_t, cache, prompt_len=3)
    target_dist = np.asarray(_dist(logits0[0, 2][None], 1.0, 8, False)[0])

    # speculative first tokens
    counts = np.zeros(V)
    for s in range(n):
        got, _ = generate_speculative(params_t, params_d, pj, 3,
                                      jax.random.PRNGKey(s), cfg_t, cfg_d,
                                      6, gamma=2, temperature=1.0, top_k=8,
                                      eos_id=-1, pad_id=0)
        counts[int(np.asarray(got)[0, 3])] += 1
    emp = counts / n
    # total-variation distance small
    tv = 0.5 * np.abs(emp - target_dist).sum()
    assert tv < 0.12, (tv, emp.round(3), target_dist.round(3))


def test_sampled_second_token_distribution_preserved():
    """Second generated token: exercises the accept/resample path (the
    first token comes from prefill, the second from the speculative loop).
    Compare speculative vs target-only generate_kv empirically with the
    same number of samples from both."""
    params_t, cfg_t, params_d, cfg_d = models(seed_t=5, seed_d=6)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [3, 1, 2]
    pj = jnp.asarray(prompt)
    n = 400
    c_spec = np.zeros(V)
    c_ref = np.zeros(V)
    for s in range(n):
        got, _ = generate_speculative(params_t, params_d, pj, 3,
                                      jax.random.PRNGKey(s), cfg_t, cfg_d,
                                      6, gamma=2, top_k=8, eos_id=-1,
                                      pad_id=0)
        c_spec[int(np.asarray(got)[0, 4])] += 1
        ref, _ = generate_kv(params_t, pj, 3, jax.random.PRNGKey(10_000 + s),
                             cfg_t, 6, top_k=8, eos_id=-1, pad_id=0,
                             refeed_last_prompt=False)
        c_ref[int(np.asarray(ref)[0, 4])] += 1
    tv = 0.5 * np.abs(c_spec / n - c_ref / n).sum()
    assert tv < 0.15, tv


def test_generator_speculative_api():
    from eamg_tpu.decode import Generator
    from eamg_tpu.tokenizer import Vocab

    params_t, cfg_t, params_d, cfg_d = models(seed_t=7, seed_d=8)
    vocab = Vocab({str(i): i for i in range(V)})
    target = Generator(params_t, cfg_t, vocab, eos_token="none",
                       pad_token="0")
    draft = Generator(params_d, cfg_d, vocab, eos_token="none",
                      pad_token="0")
    spec = target.generate_ids_speculative(draft, [1, 2, 3], max_len=20,
                                           greedy=True)[0]
    ref = target.generate_ids([1, 2, 3], max_len=20, greedy=True,
                              refeed_last_prompt=False)[0]
    assert spec.tolist() == ref.tolist()


def test_speculative_overlength_prompt_returns_prompt():
    """Reference zero-generation-steps semantics (api_cache.py:166) — the
    same guard generate_ids and the batchers have."""
    from eamg_tpu.decode import Generator
    from eamg_tpu.tokenizer import Vocab

    params_t, cfg_t, params_d, cfg_d = models(seed_t=1, seed_d=2)
    vocab = Vocab({str(i): i for i in range(V)})
    target = Generator(params_t, cfg_t, vocab, eos_token="none",
                       pad_token="0")
    draft = Generator(params_d, cfg_d, vocab, eos_token="none",
                      pad_token="0")
    prompt = list(range(1, 25))
    out = target.generate_ids_speculative(draft, prompt, max_len=16)
    assert out[0].tolist() == prompt
