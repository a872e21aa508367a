"""Headline benchmark: MIDI-token decode throughput on one TPU chip.

Flagship config = BASELINE config 3/4 territory: the train_large2 geometry
(d=512, h=8, L=6, 8324-token Scheme-B2 vocab, reference
train/train_large2.py:10-19), KV-cache decode with fused temperature/top-50
sampling, 512-token generations at batch 8, bfloat16 activations.

Baseline: the reference's published per-token KV-cache decode latency of
0.29 ms/token (paper §10/§11, RTX A4000, batch 1) = 3,448 tokens/s.
``vs_baseline`` = our tokens/s/chip / 3,448.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_TOKENS_PER_S = 1000.0 / 0.29  # paper §11: 0.29 ms/token


def main():
    from eamg_tpu.decode import generate_kv
    from eamg_tpu.models import init_params, preset
    from eamg_tpu.tokenizer import SchemeB2

    scheme = SchemeB2()
    cfg = preset("large2", vocab_size=len(scheme.vocab))
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16",
                       "causal": True})
    params = init_params(jax.random.PRNGKey(0), cfg)
    # store weights bf16: HBM reads halve (the cast happens before the
    # read otherwise)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # decode to the positional-table limit (seq_len-1 rows on trainer
    # geometries; decoding to 512 would clamp the final position lookup)
    batch, max_len = 8, cfg.n_pos
    prompt_len = 3
    prompt = np.zeros((batch, 16), np.int32)
    prompt[:, :prompt_len] = [[1, 2, 3]]  # [START_SEQ] + control tokens
    prompt_j = jnp.asarray(prompt)

    def run(seed):
        buf, pos = generate_kv(
            params, prompt_j, prompt_len, jax.random.PRNGKey(seed), cfg,
            max_len, temperature=1.0, top_k=50, eos_id=-1, pad_id=0,
            refeed_last_prompt=False, top_k_impl="pallas")
        # fetch to host: on the tunneled axon backend block_until_ready
        # returns before execution completes, so time the D2H fetch
        return np.asarray(buf), pos

    run(0)  # compile
    times = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_tokens = (max_len - prompt_len) * batch
    tok_per_s = n_tokens / dt
    print(json.dumps({
        "metric": "midi_tokens_per_sec_per_chip",
        "value": round(tok_per_s, 1),
        "unit": "tokens/s (d512 L6 V8324, KV-cache top-50 sampling, "
                "batch 8, 511-token generations, bf16, pallas top-k "
                "threshold)",
        "vs_baseline": round(tok_per_s / BASELINE_TOKENS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
