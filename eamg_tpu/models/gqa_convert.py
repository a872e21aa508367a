"""MHA -> GQA checkpoint conversion (mean-pooled K/V heads).

GQA is the one measured lever that actually cuts decode latency on this
runtime (fewer K/V elements through the MXU — docs/DESIGN.md §3.7; the
fold-kernel and int8 routes are measured negatives). It is opt-in because
reference checkpoints are MHA (api_cache.py:80: n_head=8 shared by Q/K/V)
and changing head count breaks bit-parity. This converter turns an
existing MHA checkpoint into a GQA one by mean-pooling each group of K/V
heads (the GQA-paper initialization; Ainslie et al. 2023 report pooled
heads recover with ~5% uptraining): run a short finetune afterwards
(``cli train --resume``) to recover quality.

If the group's K/V heads are identical, conversion is exact — pinned by
tests/test_gqa_convert.py.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from .gpt import GPTConfig


def convert_mha_to_gqa(params: dict, cfg: GPTConfig,
                       n_kv_heads: int) -> tuple[dict, GPTConfig]:
    """Mean-pool the K/V projection head-blocks of every layer:
    ``in_w`` [3D, D] -> [D + 2*KVD, D] (torch fused-in_proj layout:
    rows = Q block, K block, V block). Q rows and everything else are
    unchanged."""
    assert cfg.kv_heads == cfg.n_head, (
        f"source must be MHA (has n_kv_heads={cfg.n_kv_heads})")
    H, Dh, D = cfg.n_head, cfg.head_dim, cfg.d_model
    assert H % n_kv_heads == 0, (
        f"n_head={H} not divisible by n_kv_heads={n_kv_heads}")
    g = H // n_kv_heads

    def pool_rows(w):
        """[D, ...] K-or-V block -> [n_kv_heads*Dh, ...]: group-mean over
        the head axis."""
        return np.asarray(w).reshape(n_kv_heads, g, Dh, *w.shape[1:]) \
            .mean(axis=1).reshape(n_kv_heads * Dh, *w.shape[1:])

    new_layers = []
    for layer in params["layers"]:
        attn = layer["attn"]
        in_w, in_b = np.asarray(attn["in_w"]), np.asarray(attn["in_b"])
        qw, kw, vw = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
        qb, kb, vb = in_b[:D], in_b[D:2 * D], in_b[2 * D:]
        new_layers.append({
            **layer,
            "attn": {
                **attn,
                "in_w": np.concatenate(
                    [qw, pool_rows(kw), pool_rows(vw)], axis=0),
                "in_b": np.concatenate(
                    [qb, pool_rows(kb), pool_rows(vb)], axis=0),
            },
        })
    new_params = {**params, "layers": new_layers}
    new_cfg = dataclasses.replace(cfg, n_kv_heads=n_kv_heads)
    return jax.tree.map(np.asarray, new_params), new_cfg


def convert_checkpoint_dir(src: str, dst: str, n_kv_heads: int) -> None:
    """checkpoint dir (MHA) -> checkpoint dir (GQA). Optimizer state is
    dropped (its K/V slots no longer match); step/vocab/extra carry over."""
    from ..utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(src)
    params, cfg = convert_mha_to_gqa(ckpt["params"], ckpt["cfg"],
                                     n_kv_heads)
    save_checkpoint(dst, params, ckpt["vocab"], cfg, step=ckpt["step"],
                    rng_key=ckpt["rng_key"],
                    extra={**ckpt["extra"],
                           "gqa_converted_from": f"mha-{ckpt['cfg'].n_head}h"})
