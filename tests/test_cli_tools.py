"""CLI and tools tests: end-to-end train run, generate, corpus build,
analysis, checkpoint conversion from a reference-format .pt (written by a
torch subprocess)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from eamg_tpu.cli import main as cli_main
from eamg_tpu.tools.analysis import analyze_corpus, write_report
from eamg_tpu.tools.corpus import build_corpus_csv
from eamg_tpu.train.data import write_synthetic_csv
from eamg_tpu.train.run import run_training


def test_run_training_mini_synthetic(tmp_path):
    out = run_training("mini", synthetic_rows=16, out_dir=str(tmp_path),
                       epochs=1, save_every_steps=1)
    assert out["steps"] >= 1
    assert np.isfinite(out["final_loss"])
    assert (tmp_path / "final" / "params.pkl").exists()
    assert (tmp_path / "latest" / "params.pkl").exists()
    assert (tmp_path / "ep1" / "meta.json").exists()


def test_run_training_scheme_b2(tmp_path):
    out = run_training("large2", synthetic_rows=32,
                       out_dir=str(tmp_path), epochs=1)
    assert out["vocab_size"] == 8324


def test_cli_train_and_generate(tmp_path, capsys):
    ckpt = tmp_path / "ckpt"
    cli_main(["train", "--preset", "mini", "--synthetic", "16",
              "--epochs", "1", "--out", str(ckpt), "--log-every", "0"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] >= 1

    mid = tmp_path / "g.mid"
    wav = tmp_path / "g.wav"
    cli_main(["generate", "--checkpoint", str(ckpt / "final"),
              "--bpm", "120", "--key", "C major",
              "--instruments", "Violin", "--max-len", "64",
              "--out", str(mid), "--wav", str(wav), "--seed", "1"])
    assert mid.read_bytes()[:4] == b"MThd"
    assert wav.read_bytes()[:4] == b"RIFF"


def test_corpus_build_and_analyze(tmp_path, fixture_mid):
    midi_dir = tmp_path / "mids"
    midi_dir.mkdir()
    import shutil

    shutil.copy(fixture_mid, midi_dir / "a.mid")
    shutil.copy(fixture_mid, midi_dir / "b.mid")
    csv_path = tmp_path / "corpus.csv"
    result = build_corpus_csv(str(midi_dir), str(csv_path))
    assert result == {"written": 2, "failed": 0}

    stats = analyze_corpus(str(csv_path))
    assert stats["rows"] == 2
    assert sum(stats["instruments"].values()) == 10  # 5 instruments x 2
    report = tmp_path / "analysis_output.txt"
    write_report(stats, str(report))
    text = report.read_text()
    assert "Key Signature Counts" in text and "Instrument Counts" in text


def test_synthetic_csv_trains(tmp_path):
    csv_path = tmp_path / "synth.csv"
    write_synthetic_csv(str(csv_path), 16, seed=1, n_notes=6)
    out = run_training("mini", csv_path=str(csv_path),
                       out_dir=str(tmp_path / "ck"), epochs=1)
    assert np.isfinite(out["final_loss"])


def test_convert_reference_pt(tmp_path):
    """A reference-format .pt written by a torch subprocess imports into a
    loadable checkpoint dir and generates."""
    script = r"""
import sys, torch, torch.nn as nn
V, SEQ, D = 37, 16, 32
class GPT(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(V, D)
        self.pos = nn.Parameter(torch.zeros(SEQ - 1, D))
        blk = nn.TransformerEncoderLayer(D, 4, D * 4, batch_first=True)
        self.tr = nn.TransformerEncoder(blk, 2)
        self.fc = nn.Linear(D, V)
torch.manual_seed(0)
m = GPT()
vocab = {f"t{i}": i for i in range(V)}
vocab["[PAD]"] = 0; del vocab["t0"]
torch.save({"model": m.state_dict(), "vocab": vocab,
            "cfg": {"seq_len": SEQ, "d_model": D, "n_head": 4,
                    "n_layer": 2}}, sys.argv[1])
"""
    pt = tmp_path / "ref.pt"
    subprocess.run([sys.executable, "-c", script, str(pt)], check=True,
                   timeout=300)

    from eamg_tpu.tools.convert import convert_reference_pt
    from eamg_tpu.utils import load_checkpoint

    out = tmp_path / "converted"
    convert_reference_pt(str(pt), str(out))
    ckpt = load_checkpoint(str(out))
    assert ckpt["cfg"].d_model == 32
    assert ckpt["cfg"].n_layer == 2
    assert ckpt["cfg"].seq_len == 16
    assert len(ckpt["vocab"]) == 37

    from eamg_tpu.decode import Generator
    from eamg_tpu.tokenizer import Vocab

    gen = Generator(ckpt["params"], ckpt["cfg"], Vocab(ckpt["vocab"]),
                    eos_token="none", pad_token="[PAD]")
    row = gen.generate_ids([1, 2], max_len=10, greedy=True)[0]
    assert len(row) == 10


def test_run_training_resume(tmp_path):
    """Resume continues from the saved step with optimizer state intact."""
    out1 = run_training("mini", synthetic_rows=16, out_dir=str(tmp_path),
                        epochs=1)
    resumed = run_training("mini", synthetic_rows=16,
                           out_dir=str(tmp_path / "r"), epochs=1,
                           resume_from=str(tmp_path / "final"))
    assert resumed["steps"] > out1["steps"]
    assert np.isfinite(resumed["final_loss"])


def test_cli_emotion_cmd(capsys):
    cli_main(["emotion", "--text", "I am so happy today", "--seed", "3"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["label"] == "joy"
    assert "bpm" in out["mapping"]
    assert len(out["top_k"]) == 3


def test_cli_speculative_generate(tmp_path, capsys):
    """--draft path: train two tiny models, generate speculatively."""
    tgt = tmp_path / "t"
    drf = tmp_path / "d"
    cli_main(["train", "--preset", "mini", "--synthetic", "12",
              "--epochs", "1", "--out", str(tgt), "--log-every", "0"])
    cli_main(["train", "--preset", "mini", "--synthetic", "12",
              "--epochs", "1", "--out", str(drf), "--log-every", "0"])
    capsys.readouterr()
    # mini preset is non-causal (reference arch) -> speculative must refuse
    mid = tmp_path / "g.mid"
    with pytest.raises(AssertionError, match="causal"):
        cli_main(["generate", "--checkpoint", str(tgt / "final"),
                  "--draft", str(drf / "final"), "--bpm", "120",
                  "--key", "C major", "--instruments", "Violin",
                  "--max-len", "48", "--out", str(mid)])


def test_export_reference_pt_contract(tmp_path):
    """Our .pt export loads strict=True into the reference's own
    architecture (torch, in a subprocess) — the backward interop
    contract."""
    import jax

    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.utils import export_reference_pt

    cfg = GPTConfig(vocab_size=41, seq_len=16, d_model=32, n_head=4,
                    n_layer=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    pt = tmp_path / "ours.pt"

    # export runs in a subprocess too (torch+jax process isolation)
    import pickle

    blob = tmp_path / "args.pkl"
    with open(blob, "wb") as f:
        import numpy as np

        pickle.dump({"params": jax.tree.map(np.asarray, params),
                     "vocab": {"[PAD]": 0},
                     "cfg_kwargs": dict(vocab_size=41, seq_len=16,
                                        d_model=32, n_head=4, n_layer=2)},
                    f)
    script = f"""
import pickle, sys
sys.path.insert(0, '/root/repo')
with open({str(blob)!r}, 'rb') as f:
    a = pickle.load(f)
from eamg_tpu.models.gpt import GPTConfig
from eamg_tpu.utils.checkpoint import export_reference_pt
cfg = GPTConfig(**a['cfg_kwargs'])
export_reference_pt({str(pt)!r}, a['params'], a['vocab'], cfg)

# now rebuild the reference architecture and load strict=True
import torch, torch.nn as nn
ckpt = torch.load({str(pt)!r}, map_location='cpu', weights_only=True)
c = ckpt['cfg']
class GPT(nn.Module):
    def __init__(s):
        super().__init__()
        s.emb = nn.Embedding(41, c['d_model'])
        s.pos = nn.Parameter(torch.zeros(c['seq_len'] - 1, c['d_model']))
        blk = nn.TransformerEncoderLayer(c['d_model'], c['n_head'],
                                         c['d_model'] * 4, batch_first=True)
        s.tr = nn.TransformerEncoder(blk, c['n_layer'])
        s.fc = nn.Linear(c['d_model'], 41)
m = GPT()
m.load_state_dict(ckpt['model'], strict=True)
print('STRICT_LOAD_OK')
"""
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, timeout=900, text=True)
    assert "STRICT_LOAD_OK" in out.stdout, out.stderr[-2000:]


def test_native_loader_python_fallback(tmp_path, monkeypatch):
    """When the toolchain is unavailable, explode_csv falls back to the
    Python tokenizer with identical results."""
    import numpy as np

    from eamg_tpu.tools import native_loader
    from eamg_tpu.train.data import write_synthetic_csv

    csv_path = tmp_path / "c.csv"
    write_synthetic_csv(str(csv_path), 6, seed=5, n_notes=5)
    native_ids, native_lens = native_loader.explode_csv(
        str(csv_path), "b2", seq_len=64)

    def boom(*a, **k):
        raise native_loader.NativeUnavailable("forced")

    monkeypatch.setattr(native_loader, "explode_csv_native", boom)
    py_ids, py_lens = native_loader.explode_csv(str(csv_path), "b2",
                                                seq_len=64)
    np.testing.assert_array_equal(native_ids, py_ids)
    np.testing.assert_array_equal(native_lens, py_lens)


def test_cli_corrected_speculative_success(tmp_path, capsys):
    """Corrected-mode training + speculative generation end-to-end: two
    causal minis over the same vocab, draft-accelerated generation
    succeeds and writes a valid MIDI."""
    tgt = tmp_path / "t"
    drf = tmp_path / "d"
    for out, seed in ((tgt, "0"), (drf, "0")):
        cli_main(["train", "--preset", "mini", "--synthetic", "12",
                  "--epochs", "1", "--out", str(out), "--log-every", "0",
                  "--corrected", "--seed", seed])
    capsys.readouterr()
    mid = tmp_path / "g.mid"
    cli_main(["generate", "--checkpoint", str(tgt / "final"),
              "--draft", str(drf / "final"), "--bpm", "120",
              "--key", "C major", "--instruments", "Violin",
              "--max-len", "48", "--gamma", "3", "--out", str(mid),
              "--seed", "2"])
    assert mid.read_bytes()[:4] == b"MThd"

    from eamg_tpu.utils import load_checkpoint

    assert load_checkpoint(str(tgt / "final"))["cfg"].causal


def test_cli_b3_train_geometry_and_generate(tmp_path, capsys):
    """Geometry-overridden B3 training + scheme-detected generation (the
    packaged-demo recipe, tiny): cli train --scheme b3 --d-model ... then
    cli generate --checkpoint picks the control-token path from the
    vocab."""
    ckpt = tmp_path / "b3ckpt"
    cli_main(["train", "--preset", "no_inst", "--synthetic", "12",
              "--epochs", "1", "--corrected", "--d-model", "32",
              "--n-head", "4", "--n-layer", "1", "--seq-len", "48",
              "--out", str(ckpt), "--log-every", "0"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] >= 1

    mid = tmp_path / "b3.mid"
    cli_main(["generate", "--checkpoint", str(ckpt / "final"),
              "--bpm", "140", "--key", "D minor", "--max-len", "48",
              "--out", str(mid), "--seed", "2"])
    out = capsys.readouterr().out
    assert "BPM_140" in out          # conditioned control prefix
    assert mid.read_bytes()[:4] == b"MThd"
