"""Streaming decode: chunked output equals the one-shot compiled loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.decode.stream import stream_tokens
from eamg_tpu.models import GPTConfig, init_params

CFG = GPTConfig(vocab_size=64, seq_len=64, d_model=32, n_head=4, n_layer=2,
                pos_rows=64, ln_placement="pre", activation="gelu",
                causal=True)


def one_shot(params, prompt_ids, max_len, **kw):
    prompt = np.zeros((1, 8), np.int32)
    prompt[0, :len(prompt_ids)] = prompt_ids
    buf, pos = generate_kv(params, jnp.asarray(prompt), len(prompt_ids),
                           jax.random.PRNGKey(0), CFG, max_len,
                           eos_id=kw.get("eos_id", -1), pad_id=0,
                           greedy=kw.get("greedy", False),
                           refeed_last_prompt=False)
    return np.asarray(buf)[0, len(prompt_ids):int(pos)].tolist()


@pytest.mark.parametrize("chunk", [1, 4, 16])
def test_greedy_stream_matches_one_shot(chunk):
    params = init_params(jax.random.PRNGKey(0), CFG)
    ref = one_shot(params, [1, 2, 3], 40, greedy=True)
    got = list(stream_tokens(params, CFG, [1, 2, 3], 40, chunk=chunk,
                             greedy=True, eos_id=-1))
    assert got == ref


def test_stream_stops_at_eos():
    params = init_params(jax.random.PRNGKey(1), CFG)
    ref = one_shot(params, [4, 5], 40, greedy=True)
    eos = ref[3]
    got = list(stream_tokens(params, CFG, [4, 5], 40, chunk=8, greedy=True,
                             eos_id=eos))
    assert got[-1] == eos
    assert eos not in got[:-1]
    assert got == ref[:ref.index(eos) + 1]


def test_stream_sampled_reproducible():
    params = init_params(jax.random.PRNGKey(2), CFG)
    a = list(stream_tokens(params, CFG, [1, 2], 32, chunk=4, seed=9))
    b = list(stream_tokens(params, CFG, [1, 2], 32, chunk=4, seed=9))
    c = list(stream_tokens(params, CFG, [1, 2], 32, chunk=4, seed=10))
    assert a == b
    assert a != c


def test_stream_respects_max_len():
    params = init_params(jax.random.PRNGKey(3), CFG)
    got = list(stream_tokens(params, CFG, [1, 2, 3], 20, chunk=7,
                             eos_id=-1, seed=4))
    assert len(got) == 20 - 3


def test_stream_penalties_match_one_shot_and_restrict():
    """Greedy + presence penalty: the chunked stream carries the counts
    state across chunk programs and bit-matches the one-shot loop; the
    huge-penalty stream never repeats a token."""
    params = init_params(jax.random.PRNGKey(5), CFG)
    pen = (1.0, 0.0, 1e9)
    prompt = np.zeros((1, 8), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv(params, jnp.asarray(prompt), 3,
                           jax.random.PRNGKey(0), CFG, 24, eos_id=-1,
                           pad_id=0, greedy=True, refeed_last_prompt=False,
                           penalties=pen)
    ref = np.asarray(buf)[0, 3:int(pos)].tolist()
    got = list(stream_tokens(params, CFG, [1, 2, 3], 24, chunk=4,
                             greedy=True, eos_id=-1, penalties=pen))
    assert got == ref
    full = [1, 2, 3] + got
    assert len(set(full)) == len(full)     # no repeats incl. the prompt
    # mild penalties: stream still equals the one-shot loop (sampled path
    # exercises per-chunk counts handoff under split-key parity)
    pen2 = (1.5, 0.2, 0.1)
    buf2, pos2 = generate_kv(params, jnp.asarray(prompt), 3,
                             jax.random.PRNGKey(0), CFG, 24, eos_id=-1,
                             pad_id=0, greedy=True,
                             refeed_last_prompt=False, penalties=pen2)
    ref2 = np.asarray(buf2)[0, 3:int(pos2)].tolist()
    got2 = list(stream_tokens(params, CFG, [1, 2, 3], 24, chunk=5,
                              greedy=True, eos_id=-1, penalties=pen2))
    assert got2 == ref2
