"""Ragged batched generation: every row of a mixed-length batch must equal
its own single-row run (greedy), rows finish independently on EOS, and
per-row lengths are respected."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.decode.ragged import (decode_step_ragged, generate_kv_ragged,
                                    init_ragged_cache, prefill_ragged)
from eamg_tpu.models import GPTConfig, init_params

CFG = GPTConfig(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
                pos_rows=48, causal=True)

PROMPTS = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10], [11]]


def ragged_batch(prompts, width=8):
    B = len(prompts)
    arr = np.zeros((B, width), np.int32)
    lens = np.zeros((B,), np.int32)
    for i, p in enumerate(prompts):
        arr[i, :len(p)] = p
        lens[i] = len(p)
    return jnp.asarray(arr), jnp.asarray(lens)


def test_ragged_rows_equal_individual_runs():
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt, lens = ragged_batch(PROMPTS)
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(0), CFG, 24,
                                  greedy=True, eos_id=-1, pad_id=0)
    buf = np.asarray(buf)
    pos = np.asarray(pos)
    for i, p in enumerate(PROMPTS):
        single = np.zeros((1, 8), np.int32)
        single[0, :len(p)] = p
        ref, ref_pos = generate_kv(params, jnp.asarray(single), len(p),
                                   jax.random.PRNGKey(0), CFG, 24,
                                   greedy=True, eos_id=-1, pad_id=0,
                                   refeed_last_prompt=False)
        assert buf[i, :int(pos[i])].tolist() == \
            np.asarray(ref)[0, :int(ref_pos)].tolist(), f"row {i}"


def test_ragged_prefill_matches_uniform():
    """When all rows share a length, ragged prefill == plain prefill."""
    from eamg_tpu.models import init_kv_cache, prefill

    params = init_params(jax.random.PRNGKey(1), CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 64, (3, 6)))
    lens = jnp.full((3,), 6, jnp.int32)
    la, ca = prefill_ragged(params, ids, lens, CFG,
                            init_ragged_cache(CFG, 3, 16))
    lb, cb = prefill(params, ids, CFG, init_kv_cache(CFG, 3, 16),
                     prompt_len=6)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-4,
                               rtol=2e-4)
    for a, b in zip(ca["k"], cb["k"]):
        np.testing.assert_allclose(np.asarray(a[:, :, :6]),
                                   np.asarray(b[:, :, :6]), atol=1e-4,
                                   rtol=1e-4)


def test_ragged_eos_per_row():
    params = init_params(jax.random.PRNGKey(2), CFG)
    prompt, lens = ragged_batch([[1, 2, 3], [4, 5, 6]], width=4)
    # find, per row, the first greedily-generated token; use row 0's as eos
    buf0, _ = generate_kv_ragged(params, prompt, lens,
                                 jax.random.PRNGKey(0), CFG, 20,
                                 greedy=True, eos_id=-1, pad_id=0)
    eos = int(np.asarray(buf0)[0, 4])  # row 0's second generated token
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(0), CFG, 20,
                                  greedy=True, eos_id=eos, pad_id=0)
    buf, pos = np.asarray(buf), np.asarray(pos)
    row0 = buf[0, :pos[0]]
    assert row0[-1] == eos
    # row 1 keeps generating past row 0's stop (unless it also hit eos)
    assert pos[1] == 20 or buf[1, pos[1] - 1] == eos
    # tail of row 0 is PAD
    assert np.all(buf[0, pos[0]:] == 0)


def test_ragged_sampled_reproducible():
    params = init_params(jax.random.PRNGKey(3), CFG)
    prompt, lens = ragged_batch(PROMPTS)
    a, _ = generate_kv_ragged(params, prompt, lens, jax.random.PRNGKey(7),
                              CFG, 20, eos_id=-1, pad_id=0)
    b, _ = generate_kv_ragged(params, prompt, lens, jax.random.PRNGKey(7),
                              CFG, 20, eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_ragged_step_lengths_advance():
    params = init_params(jax.random.PRNGKey(4), CFG)
    prompt, lens = ragged_batch([[1, 2], [3, 4, 5]], width=4)
    cache = init_ragged_cache(CFG, 2, 16)
    _, cache = prefill_ragged(params, prompt, lens, CFG, cache)
    assert cache["lengths"].tolist() == [2, 3]
    _, cache = decode_step_ragged(params, jnp.asarray([7, 8]), cache, CFG)
    assert cache["lengths"].tolist() == [3, 4]


def test_ragged_full_buffer_prompt_preserved():
    """A row whose prompt fills the whole buffer must come back unchanged
    (zero generation steps) instead of having its last token overwritten
    by a sampled token (ADVICE r1, medium)."""
    params = init_params(jax.random.PRNGKey(6), CFG)
    max_len = 8
    full = list(range(1, 9))          # exactly max_len tokens
    short = [11, 12]
    prompt, lens = ragged_batch([full, short], width=8)
    buf, pos = generate_kv_ragged(params, prompt, lens,
                                  jax.random.PRNGKey(0), CFG, max_len,
                                  greedy=True, eos_id=-1, pad_id=0)
    buf, pos = np.asarray(buf), np.asarray(pos)
    assert buf[0].tolist() == full          # untouched
    assert int(pos[0]) == max_len           # clamped, not max_len+1
    assert int(pos[1]) == max_len           # short row generated to the end
    assert buf[1, :2].tolist() == short


def test_ragged_rejects_max_len_beyond_pos_table():
    cfg = GPTConfig(vocab_size=64, seq_len=16, d_model=32, n_head=4,
                    n_layer=1, causal=True)  # n_pos = 15
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt, lens = ragged_batch([[1, 2]], width=4)
    with pytest.raises(AssertionError, match="positional table"):
        generate_kv_ragged(params, prompt, lens, jax.random.PRNGKey(0),
                           cfg, 16, greedy=True, eos_id=-1, pad_id=0)


def test_ragged_row_rng_independent_of_batch_composition():
    """With per-row keys, a row's sampled stream is identical whether it
    runs alone or coalesced with other requests — the property server-side
    request batching relies on."""
    params = init_params(jax.random.PRNGKey(5), CFG)
    key_a = jax.random.PRNGKey(101)
    key_b = jax.random.PRNGKey(202)

    prompt_a, lens_a = ragged_batch([[1, 2, 3]], width=8)
    solo, solo_pos = generate_kv_ragged(params, prompt_a, lens_a,
                                        key_a[None], CFG, 20, eos_id=-1,
                                        pad_id=0)
    both_p, both_l = ragged_batch([[1, 2, 3], [4, 5]], width=8)
    both, both_pos = generate_kv_ragged(
        params, both_p, both_l, jnp.stack([key_a, key_b]), CFG, 20,
        eos_id=-1, pad_id=0)
    assert np.asarray(both)[0].tolist() == np.asarray(solo)[0].tolist()
    assert int(np.asarray(both_pos)[0]) == int(np.asarray(solo_pos)[0])
