"""PyTorch -> JAX checkpoint importer for reference ``.pt`` files.

The import contract is the exact state-dict key dialects the reference uses
(SURVEY.md §2.3):

- **trainer dialect** (train/train_*.py, served by api.py:55):
  ``emb.weight, pos, tr.layers.N.self_attn.{in_proj_weight,in_proj_bias,
  out_proj.weight,out_proj.bias}, tr.layers.N.{linear1,linear2,norm1,norm2}.*,
  fc.{weight,bias}``
- **KV dialect** (api_cache.py:118-134 remap output):
  ``tok_emb.weight, pos_emb, layers.N.attn.*, layers.N.{ln1,ln2}.*,
  layers.N.mlp.{0,2}.*, head.{weight,bias}``

Our params are stored in torch layout so every tensor copies through without
transposition. ``load_reference_checkpoint`` reads the reference's
``{"model": state_dict, "vocab": tok2id[, "cfg"|"hparams"]}`` payload
(train/train_mini.py:82, train/train_large2.py:100-110).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..tokenizer.vocab import Vocab
from .gpt import GPTConfig


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def remap_kv_dialect(sd: dict) -> dict:
    """KV dialect -> trainer dialect key names (inverse-direction twin of
    api_cache.py:118-134's remap)."""
    out = {}
    for k, v in sd.items():
        k2 = k.replace("tok_emb.weight", "emb.weight")
        k2 = k2.replace("pos_emb", "pos")
        k2 = k2.replace("head.", "fc.")
        k2 = re.sub(r"layers\.(\d+)\.attn", r"tr.layers.\1.self_attn", k2)
        k2 = re.sub(r"layers\.(\d+)\.ln1", r"tr.layers.\1.norm1", k2)
        k2 = re.sub(r"layers\.(\d+)\.ln2", r"tr.layers.\1.norm2", k2)
        k2 = re.sub(r"layers\.(\d+)\.mlp\.0", r"tr.layers.\1.linear1", k2)
        k2 = re.sub(r"layers\.(\d+)\.mlp\.2", r"tr.layers.\1.linear2", k2)
        out[k2] = v
    return out


def infer_geometry(sd: dict) -> dict:
    """Rebuild model dims from a state dict — the reference's own validation
    pattern (api.py:33-39, generate_music/generate.py:17-21)."""
    if "tok_emb.weight" in sd:
        sd = remap_kv_dialect(sd)
    layer_ids = [int(k.split(".")[2]) for k in sd if k.startswith("tr.layers.")]
    n_layer = max(layer_ids) + 1
    vocab_size, d_model = _to_np(sd["emb.weight"]).shape
    pos_rows = _to_np(sd["pos"]).shape[0]
    d_ff = _to_np(sd["tr.layers.0.linear1.weight"]).shape[0]
    return dict(vocab_size=vocab_size, d_model=d_model, n_layer=n_layer,
                pos_rows=pos_rows, d_ff=d_ff)


def import_state_dict(sd: dict, cfg: GPTConfig) -> dict:
    """torch state dict (either dialect) -> our GPT param pytree."""
    if "tok_emb.weight" in sd:
        sd = remap_kv_dialect(sd)
    g = lambda k: jnp.asarray(_to_np(sd[k]), jnp.float32)  # noqa: E731
    layers = []
    for i in range(cfg.n_layer):
        pre = f"tr.layers.{i}"
        layers.append({
            "attn": {
                "in_w": g(f"{pre}.self_attn.in_proj_weight"),
                "in_b": g(f"{pre}.self_attn.in_proj_bias"),
                "out_w": g(f"{pre}.self_attn.out_proj.weight"),
                "out_b": g(f"{pre}.self_attn.out_proj.bias"),
            },
            "ln1": {"g": g(f"{pre}.norm1.weight"),
                    "b": g(f"{pre}.norm1.bias")},
            "ln2": {"g": g(f"{pre}.norm2.weight"),
                    "b": g(f"{pre}.norm2.bias")},
            "mlp": {"w1": g(f"{pre}.linear1.weight"),
                    "b1": g(f"{pre}.linear1.bias"),
                    "w2": g(f"{pre}.linear2.weight"),
                    "b2": g(f"{pre}.linear2.bias")},
        })
    return {"tok_emb": g("emb.weight"), "pos": g("pos"), "layers": layers,
            "head": {"w": g("fc.weight"), "b": g("fc.bias")}}


def export_state_dict(params: dict, dialect: str = "trainer") -> dict:
    """Our param pytree -> torch-dialect state dict (numpy arrays), for
    round-trip tests and for handing checkpoints back to reference tooling."""
    assert not any("router" in p["mlp"] for p in params["layers"]), (
        "MoE layers have no torch state-dict dialect — the reference "
        "architecture is dense (export the dense layers only, or keep "
        "MoE checkpoints in the native directory format)")
    assert not any(isinstance(leaf, dict)
                   for p in params["layers"]
                   for grp in p.values() for leaf in grp.values()), (
        "quantized params ({'q','s'} leaves) have no torch state-dict "
        "dialect — dequantize first (the reference dialects are dense "
        "MHA float32)")
    for p in params["layers"]:
        in_w = np.asarray(p["attn"]["in_w"])
        assert in_w.shape[0] == 3 * in_w.shape[1], (
            "GQA checkpoints (n_kv_heads != n_head) have no torch "
            "state-dict dialect — the reference arch is dense MHA with a "
            "fused [3d, d] in_proj; convert back to MHA before exporting")
    sd = {"emb.weight": np.asarray(params["tok_emb"]),
          "pos": np.asarray(params["pos"]),
          "fc.weight": np.asarray(params["head"]["w"]),
          "fc.bias": np.asarray(params["head"]["b"])}
    for i, p in enumerate(params["layers"]):
        pre = f"tr.layers.{i}"
        sd[f"{pre}.self_attn.in_proj_weight"] = np.asarray(p["attn"]["in_w"])
        sd[f"{pre}.self_attn.in_proj_bias"] = np.asarray(p["attn"]["in_b"])
        sd[f"{pre}.self_attn.out_proj.weight"] = np.asarray(p["attn"]["out_w"])
        sd[f"{pre}.self_attn.out_proj.bias"] = np.asarray(p["attn"]["out_b"])
        sd[f"{pre}.norm1.weight"] = np.asarray(p["ln1"]["g"])
        sd[f"{pre}.norm1.bias"] = np.asarray(p["ln1"]["b"])
        sd[f"{pre}.norm2.weight"] = np.asarray(p["ln2"]["g"])
        sd[f"{pre}.norm2.bias"] = np.asarray(p["ln2"]["b"])
        sd[f"{pre}.linear1.weight"] = np.asarray(p["mlp"]["w1"])
        sd[f"{pre}.linear1.bias"] = np.asarray(p["mlp"]["b1"])
        sd[f"{pre}.linear2.weight"] = np.asarray(p["mlp"]["w2"])
        sd[f"{pre}.linear2.bias"] = np.asarray(p["mlp"]["b2"])
    if dialect == "kv":
        remapped = {}
        for k, v in sd.items():
            k2 = k.replace("emb.weight", "tok_emb.weight")
            k2 = "pos_emb" if k == "pos" else k2
            k2 = k2.replace("fc.", "head.")
            k2 = re.sub(r"tr\.layers\.(\d+)\.self_attn", r"layers.\1.attn", k2)
            k2 = re.sub(r"tr\.layers\.(\d+)\.norm1", r"layers.\1.ln1", k2)
            k2 = re.sub(r"tr\.layers\.(\d+)\.norm2", r"layers.\1.ln2", k2)
            k2 = re.sub(r"tr\.layers\.(\d+)\.linear1", r"layers.\1.mlp.0", k2)
            k2 = re.sub(r"tr\.layers\.(\d+)\.linear2", r"layers.\1.mlp.2", k2)
            remapped[k2] = v
        return remapped
    return sd


def _torch_load_as_numpy(path) -> dict:
    """Read a torch ``.pt`` without bringing torch into THIS process.

    torch and XLA:CPU must not share a process on this host (intermittent
    segfault/futex-deadlock during jit compiles — the reason every test
    oracle runs as a subprocess). If torch is already loaded (a pure-torch
    caller), use it directly; otherwise load in a throwaway subprocess
    that re-pickles the payload with numpy tensors."""
    import sys

    if "torch" in sys.modules:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        return {"model": {k: np.asarray(v.detach().cpu())
                          for k, v in ckpt["model"].items()},
                "vocab": dict(ckpt["vocab"]),
                "cfg": dict(ckpt.get("cfg") or {}),
                "hparams": dict(ckpt.get("hparams") or {})}
    import pickle
    import subprocess
    import tempfile

    script = (
        "import pickle, sys\n"
        "import numpy as np\n"
        "import torch\n"
        "ckpt = torch.load(sys.argv[1], map_location='cpu',"
        " weights_only=True)\n"
        "out = {'model': {k: np.asarray(v.detach().cpu())\n"
        "                 for k, v in ckpt['model'].items()},\n"
        "       'vocab': dict(ckpt['vocab']),\n"
        "       'cfg': dict(ckpt.get('cfg') or {}),\n"
        "       'hparams': dict(ckpt.get('hparams') or {})}\n"
        "pickle.dump(out, open(sys.argv[2], 'wb'))\n")
    with tempfile.TemporaryDirectory() as td:
        blob = f"{td}/ckpt_np.pkl"
        subprocess.run([sys.executable, "-c", script, str(path), blob],
                       check=True, timeout=600)
        with open(blob, "rb") as f:
            return pickle.load(f)


def load_reference_checkpoint(path, serving_arch: bool = False,
                              **cfg_overrides):
    """Load a reference ``.pt`` checkpoint -> (params, cfg, Vocab).

    serving_arch=True builds the api_cache.py pre-LN/GELU serving config for
    the weights (the reference's deliberate arch mismatch, SURVEY.md §2.3.3);
    False keeps the arch the weights were trained with.
    """
    ckpt = _torch_load_as_numpy(path)
    sd = ckpt["model"]
    geom = infer_geometry(sd)
    meta = ckpt.get("cfg") or ckpt.get("hparams") or {}
    seq_len = meta.get("seq_len", geom["pos_rows"] + 1)
    n_head = meta.get("n_head", 8)
    arch = dict(ln_placement="pre", activation="gelu") if serving_arch \
        else dict(ln_placement="post", activation="relu")
    cfg = GPTConfig(vocab_size=geom["vocab_size"], seq_len=seq_len,
                    d_model=geom["d_model"], n_head=n_head,
                    n_layer=geom["n_layer"], d_ff=geom["d_ff"],
                    pos_rows=geom["pos_rows"], **arch, **cfg_overrides)
    params = import_state_dict(sd, cfg)
    vocab = Vocab(dict(ckpt["vocab"]))
    return params, cfg, vocab


def export_reference_checkpoint(path, params: dict, vocab_tok2id: dict,
                                cfg: GPTConfig,
                                dialect: str = "trainer") -> None:
    """Write a reference-format ``.pt`` file a reference user can load with
    their own scripts (``torch.load`` + ``load_state_dict(strict=True)`` —
    generate_music/generate.py:17-38, api.py:33-55, api_cache.py:26-138).

    Payload matches train_large2.py:100-110: ``{"model": state_dict,
    "vocab": tok2id, "cfg": {...}}`` with the geometry keys the reference
    CLIs read back (``seq_len``/``n_head``/...). Floating tensors are cast
    to float32 (the reference trains and serves f32; our bf16 storage is a
    TPU serving optimization). ``dialect`` picks the key naming: "trainer"
    (train_*.py / api.py) or "kv" (the api_cache.py remap output).

    torch.save runs in a throwaway subprocess — torch and XLA:CPU must not
    share a process on this host (same isolation as _torch_load_as_numpy).
    """
    sd = export_state_dict(params, dialect=dialect)
    sd = {k: (v.astype(np.float32) if np.issubdtype(
        np.asarray(v).dtype, np.floating) or str(v.dtype) == "bfloat16"
        else np.asarray(v)) for k, v in sd.items()}
    payload = {
        "model": sd,
        "vocab": dict(vocab_tok2id),
        "cfg": {"vocab_size": cfg.vocab_size, "seq_len": cfg.seq_len,
                "d_model": cfg.d_model, "n_head": cfg.n_head,
                "n_layer": cfg.n_layer, "d_ff": cfg.d_ff or 4 * cfg.d_model},
    }
    import pickle
    import subprocess
    import sys
    import tempfile

    if "torch" in sys.modules:  # pure-torch caller (tests' oracle side)
        import torch

        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()},
                    "vocab": payload["vocab"], "cfg": payload["cfg"]}, path)
        return
    script = (
        "import pickle, sys\n"
        "import numpy as np\n"
        "import torch\n"
        "p = pickle.load(open(sys.argv[1], 'rb'))\n"
        "p['model'] = {k: torch.from_numpy(np.ascontiguousarray(v))\n"
        "              for k, v in p['model'].items()}\n"
        "torch.save(p, sys.argv[2])\n")
    with tempfile.TemporaryDirectory() as td:
        blob = f"{td}/payload_np.pkl"
        with open(blob, "wb") as f:
            pickle.dump(payload, f)
        subprocess.run([sys.executable, "-c", script, blob, str(path)],
                       check=True, timeout=600)
