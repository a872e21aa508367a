"""Decode runtime tests: compiled loops vs step-by-step reference math,
reproducibility, EOS handling, batching, and parity with the torch oracle's
verbatim sample_kvcache structure."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator, generate_full, generate_kv
from eamg_tpu.decode.sampling import apply_top_k, sample_token
from eamg_tpu.models import (GPTConfig, forward, import_state_dict,
                             init_params)
from eamg_tpu.tokenizer import Vocab

jax.config.update("jax_default_matmul_precision", "highest")

V, SEQ, D, H, L = 97, 32, 64, 4, 2


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    path = tmp_path_factory.mktemp("oracle_dec") / "oracle.npz"
    script = Path(__file__).parent / "torch_oracle.py"
    subprocess.run([sys.executable, str(script), str(path)], check=True,
                   timeout=600)
    return np.load(path)


def kv_cfg():
    return GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                     n_layer=L, pos_rows=SEQ, ln_placement="pre",
                     activation="gelu", pos_broadcast_bug=True)


def post_cfg():
    return GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                     n_layer=L)


def oracle_sd(oracle, prefix):
    plen = len(prefix) + 2
    return {k[plen:]: oracle[k] for k in oracle.files
            if k.startswith(prefix + "::")}


def test_generate_kv_matches_oracle_greedy(oracle):
    """The compiled while_loop reproduces sample_kvcache verbatim (warm-up
    logits discarded, last prompt token re-fed) — bit-identical stream."""
    cfg = kv_cfg()
    params = import_state_dict(oracle_sd(oracle, "kv"), cfg)
    prompt = [5, 6, 7, 8]
    gen = Generator(params, cfg, Vocab({str(i): i for i in range(V)}),
                    eos_token="none", pad_token="0")
    row = gen.generate_ids(prompt, max_len=len(prompt) + 24, greedy=True)[0]
    assert row.tolist() == oracle["greedy_kv"][0].tolist()


def test_generate_full_matches_oracle_greedy(oracle):
    """Uncached loop == reference sample() greedy stream."""
    cfg = post_cfg()
    params = import_state_dict(oracle_sd(oracle, "post"), cfg)
    prompt = np.asarray([[1, 2, 3]], np.int32)
    buf, pos = generate_full(params, jnp.asarray(prompt), 3,
                             jax.random.PRNGKey(0), cfg, 23, greedy=True,
                             eos_id=-1, pad_id=0)
    assert np.asarray(buf)[0, :int(pos)].tolist() == \
        oracle["greedy_post"][0].tolist()


def test_sampled_runs_reproducible():
    cfg = kv_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    vocab = Vocab({str(i): i for i in range(V)})
    gen = Generator(params, cfg, vocab, eos_token="none", pad_token="0")
    a = gen.generate_ids([1, 2, 3], max_len=20, seed=42)
    b = gen.generate_ids([1, 2, 3], max_len=20, seed=42)
    c = gen.generate_ids([1, 2, 3], max_len=20, seed=43)
    assert a.tolist() == b.tolist()
    assert a.tolist() != c.tolist()


def test_eos_stops_generation():
    cfg = kv_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    vocab = Vocab({str(i): i for i in range(V)})
    gen = Generator(params, cfg, vocab, eos_token="none", pad_token="0")
    full = gen.generate_ids([4, 5], max_len=24, seed=7)[0]
    assert len(full) == 24
    # pick the first generated token as EOS and re-run: generation must
    # stop right after appending it (reference appends EOS then breaks).
    eos = int(full[2])
    gen2 = Generator(params, cfg, vocab, eos_token=str(eos), pad_token="0")
    row = gen2.generate_ids([4, 5], max_len=24, seed=7)[0]
    assert row[2] == eos
    assert len(row) == 3  # prompt(2) + EOS


def test_batch_rows_independent():
    """Batched decode: every row of a batch-4 run equals the batch-1 run
    (same seed per row isn't expected — use greedy)."""
    cfg = kv_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    vocab = Vocab({str(i): i for i in range(V)})
    gen = Generator(params, cfg, vocab, eos_token="none", pad_token="0")
    one = gen.generate_ids([7, 8, 9], max_len=20, greedy=True, batch=1)
    four = gen.generate_ids([7, 8, 9], max_len=20, greedy=True, batch=4)
    for row in four:
        assert row.tolist() == one[0].tolist()


def test_trim_at_eos():
    cfg = kv_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    tok2id = {f"t{i}": i for i in range(V)}
    tok2id["[END_SEQUENCE]"] = V - 1
    del tok2id[f"t{V-1}"]
    vocab = Vocab(tok2id)
    gen = Generator(params, cfg, vocab)
    toks = gen.sample_kvcache(["t1", "t2"], max_len=16, seed=5)
    assert all(isinstance(t, str) for t in toks)
    if "[END_SEQUENCE]" in toks:
        assert toks.index("[END_SEQUENCE]") == len(toks) - 1


def test_top_k_masking():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    masked = apply_top_k(logits, 2)
    np.testing.assert_allclose(np.asarray(masked[0, [1, 4]]), [5.0, 4.0])
    assert np.all(np.asarray(masked[0, [0, 2, 3]]) < -1e9)
    # top_k >= vocab is a no-op
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 5)),
                                  np.asarray(logits))


def test_sample_token_greedy_and_distribution():
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    assert int(sample_token(jax.random.PRNGKey(0), logits, 1.0, 0,
                            greedy=True)[0]) == 1
    # with top_k=1 sampling must always pick the max
    for s in range(5):
        assert int(sample_token(jax.random.PRNGKey(s), logits, 1.0, 1)[0]) == 1


def test_prompt_bucket_padding_invariance():
    """Greedy output must not depend on how far the prompt buffer was
    padded (bucketed compilation contract)."""
    cfg = kv_cfg()
    params = init_params(jax.random.PRNGKey(4), cfg)
    base = [3, 4, 5]
    outs = []
    for bucket in (4, 8, 16):
        prompt = np.zeros((1, bucket), np.int32)
        prompt[0, :3] = base
        buf, pos = generate_kv(params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 20, greedy=True,
                               eos_id=-1, pad_id=0)
        outs.append(np.asarray(buf)[0, :int(pos)].tolist())
    assert outs[0] == outs[1] == outs[2]


def test_full_vs_kv_equivalence_causal():
    """For a corrected causal model the uncached and KV paths must produce
    the same greedy stream (they differ for the reference's bidirectional
    mode by design)."""
    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, causal=True)
    params = init_params(jax.random.PRNGKey(5), cfg)
    prompt = np.asarray([[3, 4, 5]], np.int32)
    a, _ = generate_kv(params, jnp.asarray(prompt), 3, jax.random.PRNGKey(0),
                       cfg, 16, greedy=True, eos_id=-1, pad_id=0,
                       refeed_last_prompt=False)
    b, _ = generate_full(params, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg, 16, greedy=True,
                         eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_overlength_prompt_returns_prompt_unchanged():
    """A prompt with no room to generate comes back verbatim, matching the
    reference's empty range(max_len - len) loop (api_cache.py:166)."""
    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, causal=True)
    params = init_params(jax.random.PRNGKey(6), cfg)
    gen = Generator(params, cfg, Vocab({str(i): i for i in range(V)}),
                    eos_token="none", pad_token="0")
    prompt = list(range(1, 25))
    for use_cache in (True, False):
        row = gen.generate_ids(prompt, max_len=16, greedy=True,
                               use_cache=use_cache)[0]
        assert row.tolist() == prompt


def test_generate_ids_caps_max_len_at_pos_table():
    """Trainer presets allocate seq_len-1 pos rows; asking the cached path
    for a seq_len decode silently capped the last position lookup before
    (ADVICE r1) — now the Generator caps max_len instead of crashing."""
    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, causal=True)  # n_pos = SEQ-1
    params = init_params(jax.random.PRNGKey(7), cfg)
    gen = Generator(params, cfg, Vocab({str(i): i for i in range(V)}),
                    eos_token="none", pad_token="0")
    row = gen.generate_ids([1, 2, 3], max_len=SEQ, greedy=True)[0]
    assert len(row) <= SEQ - 1


def test_stream_overlength_prompt_yields_nothing():
    from eamg_tpu.decode.stream import stream_tokens

    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, pos_rows=SEQ, ln_placement="pre",
                    activation="gelu", causal=True)
    params = init_params(jax.random.PRNGKey(8), cfg)
    assert list(stream_tokens(params, cfg, list(range(1, 18)), 16,
                              chunk=4, greedy=True, eos_id=-1)) == []
