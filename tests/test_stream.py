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
