"""GQA conversion-and-recovery workflow: measure what the decode-latency
lever actually costs in quality, then buy the quality back.

docs/DESIGN.md §3.7's conclusion is that fewer K/V *elements* (GQA) is
the only measured lever that cuts decode latency on this runtime — but
reference-architecture checkpoints are MHA. This tool operationalizes
the Ainslie et al. 2023 GQA recipe on any trained checkpoint:

1. evaluate held-out PPL of the MHA checkpoint (teacher-forced, the
   paper §10.4 metric);
2. mean-pool K/V head groups -> GQA (models/gqa_convert.py) and evaluate
   the converted model (quality drop, for free);
3. uptrain briefly on the training distribution (a few % of the original
   steps) and evaluate again (quality recovered);
4. time KV decode for both architectures on the current backend.

`cli gqa-recover` runs it end-to-end on the packaged demo checkpoint or
any checkpoint dir; results land in the returned dict / printed JSON.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


@dataclasses.dataclass(frozen=True)
class RecoveryConfig:
    ckpt_dir: str
    kv_heads: int = 2
    out_dir: str | None = None       # save the recovered checkpoint here
    rows: int = 2000                 # synthetic corpus size
    # False matches the packaged demo's training distribution (verified:
    # its held-out PPL is 3.4 on the plain corpus vs ~3.7k on the
    # tempo-locked one — train_metrics.json's corpus note was wrong)
    tempo_locked: bool = False
    seed: int = 0
    eval_frac: float = 0.05
    steps: int = 200                 # uptraining steps
    lr: float = 1e-4
    micro_batch: int = 16
    bench_batch: int = 8             # decode-throughput measurement
    bench_iters: int = 3
    log_fn: object = print


def _decode_toks_per_sec(params, cfg, rcfg, n_gen):
    import jax
    import jax.numpy as jnp

    from ..decode import generate_kv

    prompt = np.zeros((rcfg.bench_batch, 4), np.int32)
    prompt[:, :3] = [[1, 5, 9]]
    pj = jnp.asarray(prompt)

    def run(seed):
        buf, pos = generate_kv(params, pj, 3, jax.random.PRNGKey(seed),
                               cfg, 3 + n_gen, temperature=1.0, top_k=50,
                               eos_id=-1, pad_id=0,
                               refeed_last_prompt=False)
        np.asarray(buf)  # D2H fetch == completion barrier on axon

    run(0)  # compile + warm
    ts = []
    for i in range(rcfg.bench_iters):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    return rcfg.bench_batch * n_gen / dt


def run_gqa_recovery(rcfg: RecoveryConfig) -> dict:
    import jax
    import jax.numpy as jnp

    from ..decode.replay import perplexity
    from ..models.gqa_convert import convert_mha_to_gqa
    from ..train.data import batches, pad_rows, synthetic_corpus
    from ..train.run import encode_corpus
    from ..train.trainer import TrainConfig, Trainer
    from ..utils.checkpoint import load_checkpoint, save_checkpoint

    log = rcfg.log_fn
    ckpt = load_checkpoint(rcfg.ckpt_dir)
    params, cfg, vocab_tok2id = ckpt["params"], ckpt["cfg"], ckpt["vocab"]
    params = jax.tree.map(jnp.asarray, params)

    rows = synthetic_corpus(rcfg.rows, seed=rcfg.seed,
                            tempo_locked=rcfg.tempo_locked)
    encoded, vocab = encode_corpus(rows, "b3", cfg.seq_len)
    assert len(vocab) == cfg.vocab_size, (
        f"checkpoint vocab {cfg.vocab_size} != Scheme-B3 {len(vocab)}: "
        "gqa-recover currently targets Scheme-B3 checkpoints (the "
        "packaged demo); pass your own corpus for other schemes")
    n_eval = max(1, int(len(encoded) * rcfg.eval_frac))
    train_ids, eval_ids = encoded[n_eval:], encoded[:n_eval]
    eval_padded = pad_rows(eval_ids, cfg.seq_len, vocab.pad_id)

    n_gen = cfg.n_pos - 3
    ppl_mha = perplexity(params, cfg, eval_padded, pad_id=vocab.pad_id)
    tok_s_mha = _decode_toks_per_sec(params, cfg, rcfg, n_gen)
    log(f"[gqa] MHA ({cfg.n_head} KV heads): PPL {ppl_mha:.3f}, "
        f"decode {tok_s_mha:,.0f} tok/s (batch {rcfg.bench_batch})")

    gqa_params, gqa_cfg = convert_mha_to_gqa(params, cfg, rcfg.kv_heads)
    gqa_params = jax.tree.map(jnp.asarray, gqa_params)
    ppl_conv = perplexity(gqa_params, gqa_cfg, eval_padded,
                          pad_id=vocab.pad_id)
    tok_s_gqa = _decode_toks_per_sec(gqa_params, gqa_cfg, rcfg, n_gen)
    log(f"[gqa] converted GQA-{rcfg.kv_heads} (mean-pooled): "
        f"PPL {ppl_conv:.3f}, decode {tok_s_gqa:,.0f} tok/s")

    tcfg = TrainConfig(lr=rcfg.lr, micro_batch=rcfg.micro_batch,
                       pad_id=vocab.pad_id)
    trainer = Trainer(gqa_cfg, tcfg, gqa_params)
    loss = float("nan")
    epoch = 0
    while trainer.step < rcfg.steps:
        for x, y in batches(train_ids, gqa_cfg.seq_len, vocab.pad_id,
                            tcfg.micro_batch, drop_last=False,
                            shuffle_seed=rcfg.seed + epoch):
            loss = trainer.train_step(x, y, sync=False)["loss"]
            if trainer.step >= rcfg.steps:
                break
        epoch += 1
    loss = float(loss)
    ppl_ft = perplexity(trainer.params, gqa_cfg, eval_padded,
                        pad_id=vocab.pad_id)
    log(f"[gqa] after {trainer.step} uptraining steps (lr {rcfg.lr}): "
        f"PPL {ppl_ft:.3f} (final loss {loss:.3f})")

    if rcfg.out_dir:
        save_checkpoint(rcfg.out_dir, trainer.params, vocab_tok2id,
                        gqa_cfg, step=trainer.step,
                        extra={"gqa_recovered_from": rcfg.ckpt_dir,
                               "uptrain_steps": trainer.step})
        log(f"[gqa] recovered checkpoint -> {rcfg.out_dir}")

    return {
        "kv_heads": rcfg.kv_heads,
        "ppl_mha": round(ppl_mha, 4),
        "ppl_converted": round(ppl_conv, 4),
        "ppl_recovered": round(ppl_ft, 4),
        "decode_tok_s_mha": round(tok_s_mha, 1),
        "decode_tok_s_gqa": round(tok_s_gqa, 1),
        "speedup": round(tok_s_gqa / tok_s_mha, 3),
        "uptrain_steps": trainer.step,
    }
