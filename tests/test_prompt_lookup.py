"""Prompt-lookup (draft-free n-gram) speculative decoding correctness.

Same load-bearing invariant as draft-model speculation: greedy output is
BIT-IDENTICAL to target-only greedy decoding for ANY proposal content
(matching proposals accepted, mismatches resampled to the target argmax).
Sampled mode preserves the target distribution (point-mass proposals make
Leviathan acceptance = accept w.p. p(d), residual = p minus the proposed
token, renormalized).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv, generate_prompt_lookup
from eamg_tpu.models import GPTConfig, init_params

V = 16
KW = dict(vocab_size=V, seq_len=64, d_model=32, n_head=4, n_layer=2,
          pos_rows=64, causal=True)


def model(seed=0, **over):
    cfg = GPTConfig(**{**KW, **over})
    return init_params(jax.random.PRNGKey(seed), cfg), cfg


@pytest.mark.parametrize("gamma,ngram", [(1, 1), (4, 2), (8, 3)])
def test_greedy_lookup_equals_target_greedy(gamma, ngram):
    """Small vocab + long generation → history n-grams repeat, so both the
    accept and reject paths are exercised; output must be bit-identical."""
    params, cfg = model()
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    ref, ref_pos = generate_kv(params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 40,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    got, pos, n_steps = generate_prompt_lookup(
        params, jnp.asarray(prompt), 3, jax.random.PRNGKey(0), cfg, 40,
        gamma=gamma, ngram=ngram, greedy=True, eos_id=-1, pad_id=0)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    assert int(pos) == int(ref_pos)
    # at worst one token per verify step
    assert int(n_steps) <= int(pos) - 3 - 1


def test_repetitive_history_accepts_blocks():
    """A prompt that seeds an exact loop the greedy model then continues
    must accept multi-token blocks: n_steps strictly below one-per-token.
    Construction: run target-greedy once, then re-prompt with a long
    prefix OF ITS OWN OUTPUT — continuation is identical by determinism,
    and any repetition in it is found by the lookup."""
    params, cfg = model(seed=5)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [4, 5, 6]
    ref, ref_pos = generate_kv(params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 48,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    row = np.asarray(ref)[0, :int(ref_pos)]
    # With vocab 16 a greedy stream of 45 tokens revisits states; find a
    # repeated trigram to confirm the precondition of the test.
    tri = {}
    repeated = False
    for i in range(len(row) - 2):
        k = tuple(row[i:i + 3])
        repeated |= k in tri
        tri[k] = i
    if not repeated:
        pytest.skip("greedy stream happened to have no repeated trigram")
    got, pos, n_steps = generate_prompt_lookup(
        params, jnp.asarray(prompt), 3, jax.random.PRNGKey(0), cfg, 48,
        gamma=8, ngram=3, greedy=True, eos_id=-1, pad_id=0)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    n_gen = int(pos) - 3 - 1  # tokens produced by the verify loop
    assert int(n_steps) < n_gen, \
        f"no speculation win: {int(n_steps)} steps for {n_gen} tokens"


def test_lookup_eos_stops():
    params, cfg = model(seed=2)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    ref, _ = generate_kv(params, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg, 24, greedy=True,
                         eos_id=-1, pad_id=0, refeed_last_prompt=False)
    eos = int(np.asarray(ref)[0, 5])  # 3rd generated token becomes EOS
    got, pos, _ = generate_prompt_lookup(
        params, jnp.asarray(prompt), 3, jax.random.PRNGKey(0), cfg, 24,
        gamma=4, ngram=2, greedy=True, eos_id=eos, pad_id=0)
    row = np.asarray(got)[0, :int(pos)]
    assert row[-1] == eos
    assert eos not in row[3:-1]
    ref2, pos2 = generate_kv(params, jnp.asarray(prompt), 3,
                             jax.random.PRNGKey(0), cfg, 24, greedy=True,
                             eos_id=eos, pad_id=0,
                             refeed_last_prompt=False)
    assert row.tolist() == np.asarray(ref2)[0, :int(pos2)].tolist()


def test_sampled_distribution_preserved():
    """Token at a FIXED position over many seeds ~ target-only marginal.
    Uses position prompt_len (the first verify-loop token) so acceptance
    and residual paths both contribute draws."""
    params, cfg = model(seed=3)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [7, 8, 9]
    pj = jnp.asarray(prompt)
    n = 300
    pos_checked = 4  # first + one verify-loop token

    ref_counts = np.zeros(V)
    got_counts = np.zeros(V)
    for s in range(n):
        r, rp = generate_kv(params, pj, 3, jax.random.PRNGKey(s), cfg, 8,
                            temperature=1.0, top_k=8, eos_id=-1, pad_id=0,
                            refeed_last_prompt=False)
        ref_counts[int(np.asarray(r)[0, pos_checked])] += 1
        g, gp, _ = generate_prompt_lookup(
            params, pj, 3, jax.random.PRNGKey(s), cfg, 8, gamma=2,
            ngram=1, temperature=1.0, top_k=8, eos_id=-1, pad_id=0)
        got_counts[int(np.asarray(g)[0, pos_checked])] += 1
    # total-variation distance between the two empirical distributions;
    # two independent samples of the same law at n=300 stay well under 0.25
    tv = 0.5 * np.abs(ref_counts / n - got_counts / n).sum()
    assert tv < 0.25, f"sampled marginals diverge: TV={tv:.3f}"


def test_generator_wrapper_and_overlength_prompt():
    from eamg_tpu.decode import Generator
    from eamg_tpu.tokenizer.vocab import Vocab

    params, cfg = model()
    vocab = Vocab({f"t{i}": i for i in range(V)})
    gen = Generator(params, cfg, vocab, eos_token="t15", pad_token="t0")
    row = gen.generate_ids_lookup([1, 2, 3], max_len=32, greedy=True)
    ref = gen.generate_ids([1, 2, 3], max_len=32, greedy=True,
                           refeed_last_prompt=False)
    assert row.tolist() == ref.tolist()
    # over-length prompt: returned unchanged (reference semantics)
    long_prompt = list(range(1, 10)) * 8
    out = gen.generate_ids_lookup(long_prompt, max_len=16)
    assert out.tolist() == [long_prompt]
