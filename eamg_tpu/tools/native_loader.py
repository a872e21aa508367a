"""ctypes bindings for the native (C++) corpus loader.

``explode_csv_native`` streams a corpus CSV and returns Scheme-B2/B3 id
matrices, produced by native/eamg_native.cpp (built on demand with g++,
cached under native/build/). Output is bit-identical to the Python
tokenizer (tests/test_native_loader.py proves it); it exists because the
explode loop is the host-side bottleneck when feeding multi-chip training
from the 100GB-scale Lakh CSV. Falls back to the Python path when no C++
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libeamg_native.so")

_lib = None
_lib_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = os.path.join(_NATIVE_DIR, "eamg_native.cpp")
    if not os.path.exists(src):
        raise NativeUnavailable(f"missing {src}")
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
           "-o", _SO_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as exc:
        detail = getattr(exc, "stderr", b"")
        raise NativeUnavailable(
            f"g++ build failed: {exc}: "
            f"{detail.decode() if detail else ''}") from exc


def load_native():
    """Load (building if needed) the native library; raises
    NativeUnavailable when no toolchain exists."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "eamg_native.cpp")
        if not os.path.exists(_SO_PATH) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.eamg_explode_csv.restype = ctypes.c_int
        lib.eamg_explode_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ]
        lib.eamg_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    try:
        load_native()
        return True
    except NativeUnavailable:
        return False


def explode_csv_native(path: str, scheme: str = "b2",
                       max_rows: int | None = None, seq_len: int = 512,
                       res_ms: int = 50, max_tick: int = 4095,
                       strict_parity: bool = True, min_bpm: int = 20,
                       max_bpm: int = 250
                       ) -> tuple[np.ndarray, np.ndarray]:
    """-> (ids [rows, seq_len] int32 PAD-padded, lengths [rows] int32)."""
    lib = load_native()
    data_p = ctypes.POINTER(ctypes.c_int32)()
    lens_p = ctypes.POINTER(ctypes.c_int32)()
    rows = lib.eamg_explode_csv(
        path.encode(), -1 if max_rows is None else max_rows, seq_len,
        res_ms, max_tick, {"b2": 2, "b3": 3}[scheme],
        1 if strict_parity else 0, min_bpm, max_bpm,
        ctypes.byref(data_p), ctypes.byref(lens_p))
    if rows < 0:
        raise RuntimeError(f"native explode failed for {path}")
    try:
        ids = np.ctypeslib.as_array(data_p, (rows, seq_len)).copy() \
            if rows else np.zeros((0, seq_len), np.int32)
        lens = np.ctypeslib.as_array(lens_p, (rows,)).copy() \
            if rows else np.zeros((0,), np.int32)
    finally:
        lib.eamg_free(data_p)
        lib.eamg_free(lens_p)
    return ids, lens


def explode_csv(path: str, scheme: str = "b2", **kw):
    """Native loader with transparent Python fallback."""
    try:
        return explode_csv_native(path, scheme=scheme, **kw)
    except NativeUnavailable:
        from ..tokenizer import SchemeB2, SchemeB3
        from ..train.data import iter_csv_tokens

        seq_len = kw.get("seq_len", 512)
        cls = SchemeB3 if scheme == "b3" else SchemeB2
        sch = cls(seq_len=seq_len,
                  strict_parity=kw.get("strict_parity", True))
        rows, lens = [], []
        for js in iter_csv_tokens(path, max_rows=kw.get("max_rows")):
            ids = sch.explode(js)
            lens.append(len(ids))
            rows.append(ids + [sch.vocab.pad_id] * (seq_len - len(ids)))
        return (np.asarray(rows, np.int32),
                np.asarray(lens, np.int32))
