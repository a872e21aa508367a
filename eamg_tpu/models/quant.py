"""Int8 weight-only quantization for serving.

Decode throughput is HBM-bound on weight reads (~50MB/step f32 for the
flagship geometry); storing the matmul weights as int8 with per-output-
channel scales halves that vs bf16 (4x vs f32). Quantization is a pure
params transformation — ``_linear``/``_split_qkv`` in models/gpt.py accept
either raw arrays or ``{"q": int8, "s": scales}`` leaves, so forward /
prefill / decode_step / decode_block all work unchanged. Embeddings, the
positional table and LayerNorms stay in float (tiny or gather-read).

Symmetric per-channel scheme: ``s_j = max|W_j| / 127``, ``q = round(W/s)``;
XLA fuses the int8->bf16 convert into the dot, so HBM sees int8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """[out, in] float -> {"q": int8 [out, in], "s": float32 [out, 1]}."""
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s[:, 0].astype(jnp.float32)}


def dequantize_weight(wq: dict) -> jax.Array:
    return wq["q"].astype(jnp.float32) * wq["s"][:, None]


def quantize_params(params: dict) -> dict:
    """Quantize every large matmul weight of a GPT param tree; biases,
    norms, embeddings and the pos table stay float."""
    layers = []
    for p in params["layers"]:
        layers.append({
            "attn": {
                "in_w": quantize_weight(p["attn"]["in_w"]),
                "in_b": p["attn"]["in_b"],
                "out_w": quantize_weight(p["attn"]["out_w"]),
                "out_b": p["attn"]["out_b"],
            },
            "ln1": p["ln1"], "ln2": p["ln2"],
            "mlp": {
                "w1": quantize_weight(p["mlp"]["w1"]), "b1": p["mlp"]["b1"],
                "w2": quantize_weight(p["mlp"]["w2"]), "b2": p["mlp"]["b2"],
            },
        })
    return {
        "tok_emb": params["tok_emb"],
        "pos": params["pos"],
        "layers": layers,
        "head": {"w": quantize_weight(params["head"]["w"]),
                 "b": params["head"]["b"]},
    }


def quantization_error(params: dict, qparams: dict) -> float:
    """Max relative Frobenius error across quantized weights (sanity)."""
    errs = []

    def walk(a, b):
        if isinstance(b, dict) and "q" in b and "s" in b:
            deq = dequantize_weight(b)
            errs.append(float(jnp.linalg.norm(a - deq)
                              / jnp.maximum(jnp.linalg.norm(a), 1e-9)))
        elif isinstance(b, dict):
            for k in b:
                walk(a[k], b[k])
        elif isinstance(b, list):
            for x, y in zip(a, b):
                walk(x, y)

    walk(params, qparams)
    return max(errs)
