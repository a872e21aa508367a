"""Numerical parity: our JAX GPT vs PyTorch oracles with shared weights.

The oracles run in a subprocess (tests/torch_oracle.py) because torch and
jax thread pools deadlock XLA:CPU compilation when sharing a process on
single-CPU hosts. The oracle materializes reference-architecture weights,
logits and greedy decodes; here we import the weights through our state-dict
importer and must match logits (fp32 tolerance) and greedy token streams
(bit-exact).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.models import (GPTConfig, decode_step, forward,
                             import_state_dict, infer_geometry,
                             init_kv_cache, prefill, remap_kv_dialect,
                             export_state_dict, init_params)

jax.config.update("jax_default_matmul_precision", "highest")

V, SEQ, D, H, L = 97, 32, 64, 4, 2  # must match tests/torch_oracle.py


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    path = tmp_path_factory.mktemp("oracle") / "oracle.npz"
    script = Path(__file__).parent / "torch_oracle.py"
    subprocess.run([sys.executable, str(script), str(path)], check=True,
                   timeout=600)
    return np.load(path)


def oracle_sd(oracle, prefix):
    plen = len(prefix) + 2
    return {k[plen:]: oracle[k] for k in oracle.files
            if k.startswith(prefix + "::")}


def cfg_for(arch):
    if arch == "post":
        return GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                         n_layer=L)
    if arch == "bug":
        return GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                         n_layer=L, pos_rows=SEQ, batch_first_bug=True)
    return GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                     n_layer=L, pos_rows=SEQ, ln_placement="pre",
                     activation="gelu", pos_broadcast_bug=True)


def test_forward_parity_post_ln(oracle):
    cfg = cfg_for("post")
    params = import_state_dict(oracle_sd(oracle, "post"), cfg)
    got = np.asarray(forward(params, jnp.asarray(oracle["ids1"]), cfg))
    np.testing.assert_allclose(got, oracle["logits1"], atol=2e-4, rtol=2e-4)


def test_forward_parity_batch_first_bug(oracle):
    cfg = cfg_for("bug")
    params = import_state_dict(oracle_sd(oracle, "bug"), cfg)
    got = np.asarray(forward(params, jnp.asarray(oracle["ids2"]), cfg))
    np.testing.assert_allclose(got, oracle["logits2"], atol=2e-4, rtol=2e-4)


def test_batch_first_bug_batch1_degenerates(oracle):
    """At serving (B=1) the buggy arch makes every token attend only to
    itself (SURVEY.md §2.3.2) — logits at position t must not depend on
    other positions."""
    cfg = cfg_for("bug")
    params = import_state_dict(oracle_sd(oracle, "bug"), cfg)
    rng = np.random.default_rng(2)
    ids_a = rng.integers(0, V, (1, 8))
    ids_b = ids_a.copy()
    ids_b[0, :4] = rng.integers(0, V, 4)
    la = np.asarray(forward(params, jnp.asarray(ids_a), cfg))
    lb = np.asarray(forward(params, jnp.asarray(ids_b), cfg))
    np.testing.assert_allclose(la[0, 5:], lb[0, 5:], atol=1e-5)


def test_greedy_decode_parity_no_cache(oracle):
    """Bit-identical greedy stream, uncached O(T^2) path (api.py:77-92)."""
    cfg = cfg_for("post")
    params = import_state_dict(oracle_sd(oracle, "post"), cfg)
    ids = jnp.asarray([[1, 2, 3]])
    for _ in range(20):
        nxt = jnp.argmax(forward(params, ids, cfg)[:, -1, :], -1,
                         keepdims=True)
        ids = jnp.concatenate([ids, nxt], axis=1)
    assert np.asarray(ids).tolist() == oracle["greedy_post"].tolist()


def test_kv_greedy_decode_parity(oracle):
    """Bit-identical greedy decode vs sample_kvcache (api_cache.py:159-184):
    unmasked warm-up, then one-token incremental steps with the
    position-0-broadcast quirk."""
    cfg = cfg_for("kv")
    params = import_state_dict(oracle_sd(oracle, "kv"), cfg)
    prompt = [5, 6, 7, 8]
    cache = init_kv_cache(cfg, 1, SEQ)
    logits, cache = prefill(params, jnp.asarray([prompt]), cfg, cache)
    gen = list(prompt)
    last = int(jnp.argmax(logits[0, -1]))
    for _ in range(24):
        gen.append(last)
        logits1, cache = decode_step(params, jnp.asarray([[last]]), cache,
                                     cfg)
        last = int(jnp.argmax(logits1[0]))
    assert gen == oracle["greedy_kv"][0].tolist()


def test_prefill_matches_oracle_and_forward(oracle):
    cfg = cfg_for("kv")
    params = import_state_dict(oracle_sd(oracle, "kv"), cfg)
    ids = jnp.asarray(oracle["ids3"])
    cache = init_kv_cache(cfg, 2, SEQ)
    logits_p, cache = prefill(params, ids, cfg, cache)
    np.testing.assert_allclose(np.asarray(logits_p), oracle["kv_logits3"],
                               atol=2e-4, rtol=2e-4)
    logits_f = forward(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_f),
                               atol=2e-4, rtol=2e-4)
    assert int(cache["length"]) == 10


def test_prefill_padded_prompt_equivalence(oracle):
    """Bucketed prefill: padding the prompt and masking gives the same
    logits at real positions as the unpadded prompt."""
    cfg = cfg_for("kv")
    params = import_state_dict(oracle_sd(oracle, "kv"), cfg)
    real = np.random.default_rng(4).integers(0, V, (1, 6))
    padded = np.zeros((1, 16), np.int64)
    padded[:, :6] = real
    la, _ = prefill(params, jnp.asarray(real), cfg, init_kv_cache(cfg, 1, SEQ))
    lb, cb = prefill(params, jnp.asarray(padded), cfg,
                     init_kv_cache(cfg, 1, SEQ), prompt_len=6)
    np.testing.assert_allclose(np.asarray(la[:, :6]), np.asarray(lb[:, :6]),
                               atol=2e-4, rtol=2e-4)
    assert int(cb["length"]) == 6


def test_kv_dialect_import_and_geometry(oracle):
    sd = oracle_sd(oracle, "kv")
    geom = infer_geometry(sd)
    assert geom == dict(vocab_size=V, d_model=D, n_layer=L, pos_rows=SEQ,
                        d_ff=4 * D)
    back = remap_kv_dialect(sd)
    assert "emb.weight" in back
    assert "tr.layers.0.self_attn.in_proj_weight" in back


def test_export_import_round_trip():
    cfg = cfg_for("post")
    params = init_params(jax.random.PRNGKey(9), cfg)
    sd = export_state_dict(params)
    params2 = import_state_dict(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sd_kv = export_state_dict(params, dialect="kv")
    assert "tok_emb.weight" in sd_kv and "layers.0.mlp.0.weight" in sd_kv
    params3 = import_state_dict(sd_kv, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_causal_mode_prefix_invariance():
    """Corrected causal mode: logits at position t don't depend on tokens
    after t (the reference's bidirectional mode fails this by design)."""
    cfg = GPTConfig(vocab_size=V, seq_len=SEQ, d_model=D, n_head=H,
                    n_layer=L, causal=True)
    params = init_params(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(5)
    a = rng.integers(0, V, (1, 12))
    b = a.copy()
    b[0, 8:] = rng.integers(0, V, 4)
    la = np.asarray(forward(params, jnp.asarray(a), cfg))
    lb = np.asarray(forward(params, jnp.asarray(b), cfg))
    np.testing.assert_allclose(la[0, :8], lb[0, :8], atol=1e-5)


def test_presets_cover_reference_geometries():
    from eamg_tpu.models import preset

    mini = preset("mini", vocab_size=100)
    assert (mini.d_model, mini.n_head, mini.n_layer) == (256, 4, 2)
    assert mini.batch_first_bug and mini.n_pos == 512
    large = preset("large", vocab_size=100)
    assert (large.d_model, large.n_head, large.n_layer) == (256, 8, 4)
    assert large.seq_len == 256 and large.n_pos == 255
    large2 = preset("large2", vocab_size=100)
    assert (large2.d_model, large2.n_head, large2.n_layer) == (512, 8, 6)
    kv = preset("kv_server", vocab_size=100)
    assert kv.ln_placement == "pre" and kv.activation == "gelu"
    assert kv.pos_broadcast_bug and kv.n_pos == 512
    lf = preset("longform", vocab_size=100)
    assert lf.seq_len == 2048 and lf.causal
