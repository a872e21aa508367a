"""Torch oracle, run in a SUBPROCESS by the parity tests.

torch and jax must not share a process on this machine (their thread pools
deadlock XLA:CPU compilation on single-CPU hosts), so the oracle materializes
reference-architecture weights and outputs to an .npz that the jax-side tests
load. The architectures are built with torch.nn exactly the way the
reference builds them (api.py:41-50, api_cache.py:39-106,
train/train_mini.py:52-58).

Usage: python tests/torch_oracle.py OUT.npz
"""

import sys

import numpy as np
import torch
import torch.nn as nn

V, SEQ, D, H, L = 97, 32, 64, 4, 2


class TorchGPT(nn.Module):
    """Post-LN trainer/server arch; no mask is ever passed (api.py:49-50)."""

    def __init__(self, batch_first=True, pos_rows=None):
        super().__init__()
        self.emb = nn.Embedding(V, D)
        self.pos = nn.Parameter(torch.zeros(
            pos_rows if pos_rows is not None else SEQ - 1, D))
        block = nn.TransformerEncoderLayer(D, H, D * 4,
                                           batch_first=batch_first)
        self.tr = nn.TransformerEncoder(block, L)
        self.fc = nn.Linear(D, V)

    def forward(self, x):
        return self.fc(self.tr(self.emb(x) + self.pos[:x.size(1)]))


class TorchGPTBlockKV(nn.Module):
    """Pre-LN KV block exactly as api_cache.py:39-74."""

    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(D)
        self.attn = nn.MultiheadAttention(D, H, batch_first=True)
        self.ln2 = nn.LayerNorm(D)
        self.mlp = nn.Sequential(nn.Linear(D, D * 4), nn.GELU(),
                                 nn.Linear(D * 4, D))

    def forward(self, x, layer_past=None):
        x_norm = self.ln1(x)
        q = k = v = x_norm
        if layer_past is not None:
            past_k, past_v = layer_past
            k = torch.cat([past_k, k], dim=1)
            v = torch.cat([past_v, v], dim=1)
        attn_out, _ = self.attn(q, k, v, need_weights=False)
        present = (k, v)
        x = x + attn_out
        x = x + self.mlp(self.ln2(x))
        return x, present


class TorchGPTWithKV(nn.Module):
    """api_cache.py:76-106 — note the incremental step adds pos_emb[:T]
    (i.e. pos row 0) to every new token; reproduced verbatim."""

    def __init__(self):
        super().__init__()
        self.tok_emb = nn.Embedding(V, D)
        self.pos_emb = nn.Parameter(torch.zeros(SEQ, D))
        self.layers = nn.ModuleList([TorchGPTBlockKV() for _ in range(L)])
        self.head = nn.Linear(D, V, bias=True)

    def forward(self, idx, past_kv=None):
        B, T = idx.size()
        if past_kv is None:
            past_kv = [None] * len(self.layers)
        x = self.tok_emb(idx) + self.pos_emb[:T]
        presents = []
        for layer, past in zip(self.layers, past_kv):
            x, present = layer(x, past)
            presents.append(present)
        return self.head(x), presents


def sd_to_npz(prefix, model, out):
    for k, v in model.state_dict().items():
        out[f"{prefix}::{k}"] = v.detach().numpy()


@torch.no_grad()
def main(path):
    out = {}
    rng = np.random.default_rng(0)

    # --- post-LN arch -----------------------------------------------------
    torch.manual_seed(0)
    post = TorchGPT(batch_first=True).eval()
    post.pos.normal_(0, 0.02)
    sd_to_npz("post", post, out)
    ids1 = rng.integers(0, V, (3, 17))
    out["ids1"] = ids1
    out["logits1"] = post(torch.tensor(ids1)).numpy()

    # greedy decode, uncached O(T^2) path (api.py:77-92, argmax mode)
    ids_t = torch.tensor([[1, 2, 3]])
    for _ in range(20):
        nxt = post(ids_t)[:, -1, :].argmax(-1, keepdim=True)
        ids_t = torch.cat([ids_t, nxt], dim=1)
    out["greedy_post"] = ids_t.numpy()

    # --- batch_first bug arch (train_mini.py:58) --------------------------
    torch.manual_seed(1)
    bug = TorchGPT(batch_first=False, pos_rows=SEQ).eval()
    bug.pos.normal_(0, 0.02)
    sd_to_npz("bug", bug, out)
    ids2 = rng.integers(0, V, (5, 9))
    out["ids2"] = ids2
    out["logits2"] = bug(torch.tensor(ids2)).numpy()

    # --- pre-LN KV arch (api_cache.py) -------------------------------------
    torch.manual_seed(2)
    kv = TorchGPTWithKV().eval()
    kv.pos_emb.normal_(0, 0.02)
    sd_to_npz("kv", kv, out)
    # greedy KV decode VERBATIM as sample_kvcache (api_cache.py:159-184,
    # argmax mode): warm-up logits are DISCARDED; the first loop iteration
    # re-feeds the last prompt token (duplicating it in the cache, with the
    # pos-0 quirk), and sampling starts from that step's logits.
    prompt = [5, 6, 7, 8]
    input_ids = torch.tensor([prompt])
    logits, past_kv = kv(input_ids)
    generated = input_ids
    for _ in range(24):
        last_id = generated[:, -1:]
        logits, past_kv = kv(last_id, past_kv)
        nxt = logits[:, -1, :].argmax(-1, keepdim=True)
        generated = torch.cat([generated, nxt], dim=1)
    out["greedy_kv"] = generated.numpy()
    # prompt-pass logits for prefill parity
    out["kv_prompt_logits"], _ = kv(torch.tensor([prompt]))
    out["kv_prompt_logits"] = out["kv_prompt_logits"].numpy()
    ids3 = rng.integers(0, V, (2, 10))
    out["ids3"] = ids3
    out["kv_logits3"] = kv(torch.tensor(ids3))[0].numpy()

    np.savez(path, **out)
    print("oracle written:", path)


if __name__ == "__main__":
    main(sys.argv[1])
