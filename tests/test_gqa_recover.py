"""GQA conversion-and-recovery workflow (tools/gqa_recover.py) on a tiny
Scheme-B3 checkpoint: all three PPL measurements, decode timing for both
architectures, and the recovered-checkpoint save."""

import numpy as np

import jax

from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.tokenizer.scheme_b import SchemeB3
from eamg_tpu.tools.gqa_recover import RecoveryConfig, run_gqa_recovery
from eamg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_recovery_workflow(tmp_path):
    vocab = SchemeB3(seq_len=48).vocab
    cfg = GPTConfig(vocab_size=len(vocab), seq_len=48, d_model=16,
                    n_head=4, n_layer=2, causal=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    src = str(tmp_path / "mha")
    save_checkpoint(src, params, vocab.tok2id, cfg)

    logs = []
    res = run_gqa_recovery(RecoveryConfig(
        ckpt_dir=src, kv_heads=2, out_dir=str(tmp_path / "gqa"),
        rows=40, steps=6, lr=1e-3, micro_batch=4, bench_batch=2,
        bench_iters=1, log_fn=logs.append))

    assert res["kv_heads"] == 2 and res["uptrain_steps"] == 6
    for k in ("ppl_mha", "ppl_converted", "ppl_recovered",
              "decode_tok_s_mha", "decode_tok_s_gqa", "speedup"):
        assert np.isfinite(res[k]), (k, res)
    # uptraining from the converted state must improve held-out PPL
    assert res["ppl_recovered"] < res["ppl_converted"], res
    assert len(logs) >= 4

    ckpt = load_checkpoint(str(tmp_path / "gqa"))
    assert ckpt["cfg"].n_kv_heads == 2
    assert ckpt["extra"]["gqa_recovered_from"] == src
    assert ckpt["params"]["layers"][0]["attn"]["in_w"].shape == (
        cfg.d_model + 2 * 2 * cfg.head_dim, cfg.d_model)
