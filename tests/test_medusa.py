"""Medusa multi-token decoding correctness + head training.

Load-bearing invariant (same as the other speculators): greedy output is
BIT-IDENTICAL to target-only greedy decoding for ANY head content —
matching proposals accepted, mismatches resampled to the target argmax.
Sampled mode preserves the target distribution (Leviathan acceptance
with q = the head distributions). Trained heads on a predictable corpus
must clear >1 token per verify step — the mechanism VERDICT r2 #4 asks
to measure at the batch-1 dispatch floor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.decode.medusa import (generate_medusa, init_medusa_heads,
                                    medusa_logits)
from eamg_tpu.models import GPTConfig, init_params

V = 16
KW = dict(vocab_size=V, seq_len=64, d_model=32, n_head=4, n_layer=2,
          pos_rows=64, causal=True)


def model(seed=0, **over):
    cfg = GPTConfig(**{**KW, **over})
    return init_params(jax.random.PRNGKey(seed), cfg), cfg


def random_heads(cfg, n, seed=1, scale=0.5):
    """Deliberately WRONG heads: proposals will mostly be rejected, so
    the exactness claim is stress-tested on the reject path."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 * n)
    D = cfg.d_model
    return {"blocks": [
        {"w": scale * jax.random.normal(ks[2 * i], (D, D)),
         "b": scale * jax.random.normal(ks[2 * i + 1], (D,))}
        for i in range(n)]}


@pytest.mark.parametrize("gamma", [1, 2, 4])
@pytest.mark.parametrize("head_kind", ["zero", "random"])
def test_greedy_medusa_equals_target_greedy(gamma, head_kind):
    params, cfg = model()
    heads = (init_medusa_heads(jax.random.PRNGKey(0), cfg, gamma)
             if head_kind == "zero" else random_heads(cfg, gamma))
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    ref, ref_pos = generate_kv(params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 40,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    got, pos, n_steps = generate_medusa(
        params, heads, jnp.asarray(prompt), 3, jax.random.PRNGKey(0),
        cfg, 40, gamma=gamma, greedy=True, eos_id=-1, pad_id=0)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    assert int(pos) == int(ref_pos)
    assert int(n_steps) <= int(pos) - 3 - 1


def test_greedy_medusa_eos_stops():
    params, cfg = model(seed=2)
    heads = init_medusa_heads(jax.random.PRNGKey(0), cfg, 3)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [4, 5, 6]
    ref, ref_pos = generate_kv(params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 40,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    eos = int(np.asarray(ref)[0, 10])  # force a stop partway
    got, pos, _ = generate_medusa(
        params, heads, jnp.asarray(prompt), 3, jax.random.PRNGKey(0),
        cfg, 40, gamma=3, greedy=True, eos_id=eos, pad_id=0)
    got = np.asarray(got)
    assert int(pos) <= 11
    assert got[0, int(pos) - 1] == eos
    assert (got[0, int(pos):] == 0).all()


def test_sampled_distribution_preserved():
    """Token at a fixed position over many seeds ~ target-only marginal,
    with aggressively wrong heads (reject + residual paths dominate)."""
    params, cfg = model(seed=3)
    heads = random_heads(cfg, 2, seed=9)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [7, 8, 9]
    pj = jnp.asarray(prompt)
    n = 300
    pos_checked = 4

    ref_counts = np.zeros(V)
    got_counts = np.zeros(V)
    for s in range(n):
        r, _ = generate_kv(params, pj, 3, jax.random.PRNGKey(s), cfg, 8,
                           temperature=1.0, top_k=8, eos_id=-1, pad_id=0,
                           refeed_last_prompt=False)
        ref_counts[int(np.asarray(r)[0, pos_checked])] += 1
        g, _, _ = generate_medusa(
            params, heads, pj, 3, jax.random.PRNGKey(s), cfg, 8, gamma=2,
            temperature=1.0, top_k=8, eos_id=-1, pad_id=0)
        got_counts[int(np.asarray(g)[0, pos_checked])] += 1
    tv = 0.5 * np.abs(ref_counts / n - got_counts / n).sum()
    assert tv < 0.25, f"sampled marginals diverge: TV={tv:.3f}"


@pytest.mark.parametrize("greedy", [True, False])
@pytest.mark.parametrize("k_verifies", [1, 3, 8])
def test_stream_bit_matches_one_shot(greedy, k_verifies):
    """stream_tokens_medusa shares the one-shot program's loop body and
    carries rng/cache through its state, so the accepted-token stream is
    BIT-IDENTICAL to generate_medusa for any chunk size, greedy or
    sampled — the property that lets medusa ride SSE serving."""
    from eamg_tpu.decode.medusa import stream_tokens_medusa

    params, cfg = model(seed=4)
    heads = random_heads(cfg, 3, seed=11)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    one, pos, _ = generate_medusa(
        params, heads, jnp.asarray(prompt), 3, jax.random.PRNGKey(7),
        cfg, 40, gamma=3, greedy=greedy, top_k=8, eos_id=-1, pad_id=0)
    ref = np.asarray(one)[0, 3:int(pos)].tolist()
    got = list(stream_tokens_medusa(
        params, heads, cfg, [1, 2, 3], 40, k_verifies=k_verifies,
        gamma=3, greedy=greedy, top_k=8, eos_id=-1, pad_id=0, seed=7))
    assert got == ref


def test_stream_eos_stops():
    """The streamed sequence ends exactly at the first EOS token."""
    from eamg_tpu.decode.medusa import stream_tokens_medusa

    params, cfg = model(seed=2)
    heads = init_medusa_heads(jax.random.PRNGKey(0), cfg, 3)
    ref, ref_pos = generate_kv(params, jnp.asarray(
        np.asarray([[4, 5, 6, 0]], np.int32)), 3, jax.random.PRNGKey(0),
        cfg, 40, greedy=True, eos_id=-1, pad_id=0,
        refeed_last_prompt=False)
    eos = int(np.asarray(ref)[0, 10])
    got = list(stream_tokens_medusa(
        params, heads, cfg, [4, 5, 6], 40, gamma=3, greedy=True,
        eos_id=eos, pad_id=0, seed=0))
    assert got[-1] == eos
    assert eos not in got[:-1]
    # the stream equals the eos-free reference up to its FIRST eos
    # occurrence (the eos token may appear before the position we
    # sampled it from)
    row = np.asarray(ref)[0, 3:].tolist()
    assert got == row[:row.index(eos) + 1]


def test_trained_heads_accept_multiple_tokens(tmp_path):
    """End-to-end: train a tiny model on a deterministic cyclic corpus,
    train heads on the frozen base, and the trained heads must clear >1.5
    tokens per verify step (the whole point of the mechanism)."""
    from eamg_tpu.tools.medusa import (MedusaSpec, load_medusa_heads,
                                       train_medusa_heads)
    from eamg_tpu.train.trainer import TrainConfig, Trainer
    from eamg_tpu.utils.checkpoint import save_checkpoint

    cfg = GPTConfig(vocab_size=12, seq_len=48, d_model=32, n_head=2,
                    n_layer=2, pos_rows=48, causal=True)
    # deterministic cyclic sequences: 1 2 3 4 5 6 1 2 3 ...
    rows = [[(i + s) % 10 + 2 for i in range(40)] for s in range(64)]
    params = init_params(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(cfg, TrainConfig(lr=3e-3, micro_batch=16,
                                       epochs=30), params)
    from eamg_tpu.train.data import batches

    for epoch in range(30):
        for x, y in batches(rows, cfg.seq_len, 0, 16, drop_last=False,
                            shuffle_seed=epoch):
            m = trainer.train_step(x, y, sync=False)
    assert float(m["loss"]) < 0.3, float(m["loss"])

    ckpt_dir = tmp_path / "cyc"
    vocab = {f"T{i}": i for i in range(12)}
    vocab["[PAD]"] = 0
    save_checkpoint(str(ckpt_dir), trainer.params,
                    {"[PAD]": 0, **{f"T{i}": i for i in range(1, 12)}},
                    cfg)

    # heads train on the SAME cyclic distribution
    import eamg_tpu.tools.medusa as medusa_mod

    orig = medusa_mod._corpus_for
    medusa_mod._corpus_for = lambda ckpt, n, seed: (rows[:n], type(
        "V", (), {"pad_id": 0})())
    try:
        heads_path = str(tmp_path / "heads.pkl")
        out = train_medusa_heads(str(ckpt_dir), heads_path,
                                 MedusaSpec(n_heads=3, rows=64,
                                            epochs=80, batch=16,
                                            lr=5e-3),
                                 log_fn=lambda *_: None)
        assert out["final_loss"] < 1.0
        heads = load_medusa_heads(heads_path)
    finally:
        medusa_mod._corpus_for = orig

    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [2, 3, 4]
    got, pos, n_steps = generate_medusa(
        trainer.params, heads, jnp.asarray(prompt), 3,
        jax.random.PRNGKey(0), cfg, 40, gamma=3, greedy=True, eos_id=-1,
        pad_id=0)
    ref, ref_pos = generate_kv(trainer.params, jnp.asarray(prompt), 3,
                               jax.random.PRNGKey(0), cfg, 40,
                               greedy=True, eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    tokens_per_verify = (int(pos) - 3) / int(n_steps)
    assert tokens_per_verify > 1.5, tokens_per_verify

    # the admission probe (VERDICT r4 #5) must agree with the measured
    # win: teacher-forced estimate clears the calibrated threshold on
    # trained heads, and train_medusa_heads baked the probe into the pkl
    from eamg_tpu.tools.medusa import probe_acceptance

    ids = np.zeros((16, cfg.seq_len), np.int32)
    for i, r in enumerate(rows[:16]):
        ids[i, :len(r)] = r
    probe = probe_acceptance(trainer.params, cfg, heads, ids, pad_id=0)
    assert probe["likely_win"], probe
    assert probe["tok_per_verify_est"] > 1.5, probe
    assert 0.9 < probe["base_top1"] <= 1.0, probe   # cyclic = predictable
    assert out["probe"]["tok_per_verify_est"] >= 1.0  # pkl metadata

    # deliberately wrong heads read as a loss
    bad = probe_acceptance(trainer.params, cfg, random_heads(cfg, 3),
                           ids, pad_id=0)
    assert not bad["likely_win"], bad
    assert bad["tok_per_verify_est"] < probe["tok_per_verify_est"]
