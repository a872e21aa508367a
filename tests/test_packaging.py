"""Packaging contract (VERDICT r4 #6): the wheel must be installable
OUTSIDE this repo and carry everything serving needs — declared runtime
deps (jax/numpy/optax; reference requirements.txt:1-9), a console entry
point, and the shipped artifacts (demo checkpoints, classifier, EATS
table, frontend). Offline-safe: build --no-isolation, install --no-index
--no-deps into a --target dir, run against the system site-packages.
"""

import os
import pathlib
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _clean_env():
    env = dict(os.environ)
    # drop the repo and the axon sitecustomize from the import path so
    # the subprocess exercises the INSTALLED wheel, not the source tree
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_wheel_builds_installs_and_runs(tmp_path):
    pytest.importorskip("build", reason="PEP 517 'build' tool not "
                                        "installed on this host")
    dist = tmp_path / "dist"
    r = subprocess.run(
        [sys.executable, "-m", "build", "--wheel", "--no-isolation",
         "--outdir", str(dist)],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    wheels = list(dist.glob("eamg_tpu-*.whl"))
    assert len(wheels) == 1, list(dist.iterdir())
    wheel = wheels[0]

    # wheel metadata: runtime deps + console script declared
    with zipfile.ZipFile(wheel) as z:
        names = z.namelist()
        meta_name = next(n for n in names if n.endswith("METADATA"))
        meta = z.read(meta_name).decode()
        for dep in ("jax", "numpy", "optax"):
            assert f"Requires-Dist: {dep}" in meta, meta
        ep_name = next(n for n in names if n.endswith("entry_points.txt"))
        assert "eamg = eamg_tpu.cli:main" in z.read(ep_name).decode()
        # shipped artifacts ride the wheel (a fresh install can serve)
        for artifact in (
                "eamg_tpu/serve/demo_ckpt_a/params.pkl",
                "eamg_tpu/serve/demo_ckpt_b3/params.pkl",
                "eamg_tpu/serve/demo_ckpt_a/medusa_heads.pkl",
                "eamg_tpu/emotion/lookup_table.csv",
                "eamg_tpu/emotion/ckpt_distilbert/params.pkl",
                "eamg_tpu/emotion/frozen_exam.json",
                "eamg_tpu/serve/static/index.html"):
            assert artifact in names, artifact

    # offline install into an isolated target dir
    site = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-index", "--quiet", "--target", str(site), str(wheel)],
        env=_clean_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (site / "eamg_tpu" / "serve" / "demo_ckpt_a"
            / "params.pkl").is_file()

    # console entry point generated and runnable (system site-packages
    # supply jax/numpy/optax; the wheel supplies eamg_tpu)
    script = site / "bin" / "eamg"
    assert script.is_file(), list((site / "bin").iterdir())
    env = _clean_env()
    env["PYTHONPATH"] = str(site)
    r = subprocess.run([sys.executable, str(script), "--help"],
                       cwd=tmp_path, env=env, capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "generate" in r.stdout and "serve" in r.stdout

    # the installed package resolves its own shipped artifacts
    code = (
        "import eamg_tpu, os;"
        "from eamg_tpu.serve.pipeline import packaged_demo_checkpoints;"
        "assert not eamg_tpu.__file__.startswith(%r), eamg_tpu.__file__;"
        "d = packaged_demo_checkpoints();"
        "assert 'a' in d and 'b3' in d, d;"
        "from eamg_tpu.emotion.eats import load_table;"
        "assert len(load_table()) == 28, len(load_table())"
    ) % str(REPO)
    r = subprocess.run([sys.executable, "-c", code], cwd=tmp_path,
                       env=env, capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
