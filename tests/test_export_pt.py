"""export-pt: checkpoint dir -> reference-format .pt round trip.

The reverse of convert-pt: a model trained here must be loadable by the
reference's own torch scripts (torch.load + strict load_state_dict,
generate_music/generate.py:17-38). Verified by torch-loading the exported
file in a subprocess (torch never enters the pytest process) and by a full
dir -> .pt -> dir -> greedy-decode round trip.
"""

import numpy as np
import pytest

import jax

from eamg_tpu.cli import main as cli_main
from eamg_tpu.decode import Generator
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.models.import_torch import (export_reference_checkpoint,
                                          load_reference_checkpoint)
from eamg_tpu.tokenizer.vocab import Vocab
from eamg_tpu.utils import load_checkpoint, save_checkpoint

CFG = GPTConfig(vocab_size=37, seq_len=32, d_model=16, n_head=2, n_layer=2,
                causal=True)
VOCAB = {f"T{i}": i for i in range(37)}


def _ckpt_dir(tmp_path, dtype="float32"):
    cfg = CFG if dtype == "float32" else \
        type(CFG)(**{**CFG.__dict__, "dtype": dtype})
    params = init_params(jax.random.PRNGKey(0), cfg)
    if dtype == "bfloat16":
        import jax.numpy as jnp

        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    d = tmp_path / "ckpt"
    save_checkpoint(str(d), params, VOCAB, cfg, step=7)
    return d, params, cfg


def test_export_pt_round_trip(tmp_path):
    d, params, cfg = _ckpt_dir(tmp_path)
    pt = tmp_path / "ref.pt"
    export_reference_checkpoint(str(pt), params, VOCAB, cfg)

    params2, cfg2, vocab2 = load_reference_checkpoint(
        str(pt), causal=True)  # torch.load runs in a subprocess
    assert vocab2.tok2id == VOCAB
    assert (cfg2.vocab_size, cfg2.seq_len, cfg2.d_model, cfg2.n_head,
            cfg2.n_layer) == (37, 32, 16, 2, 2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the re-imported model decodes identically
    g1 = Generator(params, cfg, Vocab(VOCAB))
    g2 = Generator(params2, cfg2, Vocab(vocab2.tok2id))
    out1 = g1.generate_ids([1, 2, 3], max_len=16, greedy=True)
    out2 = g2.generate_ids([1, 2, 3], max_len=16, greedy=True)
    np.testing.assert_array_equal(out1, out2)


def test_export_pt_bf16_casts_to_f32(tmp_path):
    d, params, cfg = _ckpt_dir(tmp_path, dtype="bfloat16")
    pt = tmp_path / "ref_bf16.pt"
    export_reference_checkpoint(str(pt), params, VOCAB, cfg)
    params2, _, _ = load_reference_checkpoint(str(pt), causal=True)
    leaves = jax.tree.leaves(params2)
    assert all(np.asarray(x).dtype == np.float32 for x in leaves)
    for a, b in zip(jax.tree.leaves(params), leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=0, atol=0)


def test_cli_export_pt(tmp_path, capsys):
    d, params, cfg = _ckpt_dir(tmp_path)
    pt = tmp_path / "cli.pt"
    cli_main(["export-pt", "--ckpt", str(d), "--pt", str(pt)])
    assert pt.exists()
    assert "exported" in capsys.readouterr().out
    # and convert-pt consumes its own export (dir -> .pt -> dir)
    back = tmp_path / "back"
    cli_main(["convert-pt", "--pt", str(pt), "--out", str(back)])
    re = load_checkpoint(str(back))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(re["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_pt_kv_dialect_keys(tmp_path):
    """The kv dialect writes the api_cache.py remap-output key names."""
    import pickle
    import subprocess
    import sys

    d, params, cfg = _ckpt_dir(tmp_path)
    pt = tmp_path / "kv.pt"
    export_reference_checkpoint(str(pt), params, VOCAB, cfg, dialect="kv")
    script = (
        "import pickle, sys, torch\n"
        "ckpt = torch.load(sys.argv[1], map_location='cpu',"
        " weights_only=True)\n"
        "pickle.dump(sorted(ckpt['model']), open(sys.argv[2], 'wb'))\n")
    keys_f = tmp_path / "keys.pkl"
    subprocess.run([sys.executable, "-c", script, str(pt), str(keys_f)],
                   check=True, timeout=600)
    keys = pickle.loads(keys_f.read_bytes())
    assert "tok_emb.weight" in keys and "pos_emb" in keys
    assert "layers.0.attn.in_proj_weight" in keys
    assert "layers.1.mlp.2.weight" in keys and "head.weight" in keys


def test_export_rejects_gqa_and_quantized(tmp_path):
    """export_state_dict refuses GQA and quantized trees with a clear
    message (ADVICE r2: these previously failed late/silently)."""
    from eamg_tpu.models.import_torch import export_state_dict

    gqa_cfg = GPTConfig(vocab_size=37, seq_len=32, d_model=16, n_head=4,
                        n_layer=1, causal=True, n_kv_heads=2)
    gqa = init_params(jax.random.PRNGKey(0), gqa_cfg)
    with pytest.raises(AssertionError, match="GQA"):
        export_state_dict(gqa)

    dense = init_params(jax.random.PRNGKey(0), CFG)
    quant = jax.tree.map(np.asarray, dense)
    w = quant["layers"][0]["mlp"]["w1"]
    quant["layers"][0]["mlp"]["w1"] = {
        "q": np.zeros(w.shape, np.int8), "s": np.ones((w.shape[0], 1))}
    with pytest.raises(AssertionError, match="quantized"):
        export_state_dict(quant)


def test_cli_export_pt_dialect_follows_ln_placement(tmp_path, capsys):
    """A pre-LN (KV-arch) checkpoint exports in the kv dialect by default
    and non-default arch flags print a warning (ADVICE r2)."""
    cfg = GPTConfig(vocab_size=37, seq_len=32, d_model=16, n_head=2,
                    n_layer=1, causal=True, ln_placement="pre",
                    activation="gelu")
    params = init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path / "pre_ckpt"
    save_checkpoint(str(d), params, VOCAB, cfg)
    pt = tmp_path / "pre.pt"
    cli_main(["export-pt", "--ckpt", str(d), "--pt", str(pt)])
    out = capsys.readouterr().out
    assert "kv dialect" in out
    assert "causal=True" in out and "warning" in out

    # kv-dialect key names confirm the default followed ln_placement
    import pickle
    import subprocess
    import sys

    script = ("import pickle, sys, torch\n"
              "ckpt = torch.load(sys.argv[1], map_location='cpu',"
              " weights_only=True)\n"
              "pickle.dump(sorted(ckpt['model']), open(sys.argv[2], 'wb'))\n")
    keys_f = tmp_path / "k.pkl"
    subprocess.run([sys.executable, "-c", script, str(pt), str(keys_f)],
                   check=True, timeout=600)
    keys = pickle.loads(keys_f.read_bytes())
    assert "tok_emb.weight" in keys and "layers.0.attn.in_proj_weight" in keys
