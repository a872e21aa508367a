"""HTTP service: the reference's ``POST /generate`` contract on stdlib.

Same surface as the FastAPI server (api_cache.py:17-24, 186-241): permissive
CORS, ``POST /generate`` with form field ``prompt`` (multipart or
urlencoded), ``audio/wav`` response named generated.wav. Additions the
reference lacked: ``?format=midi`` returns the SMF bytes, ``GET /healthz``,
structured JSON timings in the ``X-EAMG-Timings`` header, and a static
frontend at ``GET /``. ThreadingHTTPServer + an immutable jitted model
means concurrent requests share state safely (the reference mutated
module globals across uvicorn workers; SURVEY.md §5.2).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from ..utils.logging import JsonLogger, LatencyStats
from .continuous import EngineOverloaded
from .pipeline import Pipeline

_STATIC_DIR = Path(__file__).parent / "static"

_CORS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Methods": "*",
    "Access-Control-Allow-Headers": "*",
}


def _parse_multipart(body: bytes, content_type: str) -> dict[str, str]:
    """Minimal multipart/form-data parser (text fields only) — the stdlib
    replacement for python-multipart (reference requirements.txt:9)."""
    fields: dict[str, str] = {}
    boundary = None
    for part in content_type.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            boundary = part[len("boundary="):].strip('"')
    if not boundary:
        return fields
    delim = b"--" + boundary.encode()
    for chunk in body.split(delim):
        chunk = chunk.strip(b"\r\n")
        if not chunk or chunk == b"--":
            continue
        if b"\r\n\r\n" not in chunk:
            continue
        header_blob, value = chunk.split(b"\r\n\r\n", 1)
        name = None
        for line in header_blob.split(b"\r\n"):
            low = line.lower()
            if low.startswith(b"content-disposition"):
                for item in line.split(b";"):
                    item = item.strip()
                    if item.startswith(b'name="'):
                        name = item[6:-1].decode("utf-8", "replace")
        if name is not None:
            fields[name] = value.decode("utf-8", "replace")
    return fields



# request hardening (fuzz contract: malformed input -> 4xx, never 500)
MAX_BODY_BYTES = 2 << 20        # 2 MiB: far above any legitimate form
MAX_PROMPT_CHARS = 20_000       # free-text prompts are sentences


def _num(fields, key, default, conv):
    """Parse a numeric form field; ValueError carries the field name so
    the 422 body tells the client what was malformed."""
    raw = fields.get(key)
    if raw is None or raw == "":
        return default
    try:
        return conv(raw)
    except (TypeError, ValueError):
        raise ValueError(f"form field {key!r} must be a number, "
                         f"got {raw[:40]!r}") from None


def _parse_penalties(fields):
    """repetition_penalty / frequency_penalty / presence_penalty form
    fields -> (rep, freq, pres) tuple, or None when all absent/neutral
    (None keeps the penalty-free compiled programs)."""
    rep = _num(fields, "repetition_penalty", 1.0, float)
    freq = _num(fields, "frequency_penalty", 0.0, float)
    pres = _num(fields, "presence_penalty", 0.0, float)
    if (rep, freq, pres) == (1.0, 0.0, 0.0):
        return None
    return (rep, freq, pres)


def _parse_grammar(fields) -> bool:
    """grammar form field -> bool: FSM-constrained decoding over the
    served scheme's token grammar (decode/grammar.py). Off by default
    (reference parity)."""
    return fields.get("grammar", "").lower() in ("1", "true", "yes")


def _parse_ngram(fields) -> int:
    """no_repeat_ngram form field -> bounded int. The ban size n is
    STATIC (it shapes the compiled comparison network), so each distinct
    value is one compiled program — the bound keeps a hostile client from
    forcing unbounded fresh compiles (minutes each on the remote-compile
    helper); values above 8 ban essentially nothing anyway."""
    n = _num(fields, "no_repeat_ngram", 0, int)
    if n < 0 or n > 8:
        raise ValueError("no_repeat_ngram must be in [0, 8]")
    return n

class _InflightCounter:
    """Count of /generate requests between accept and response-written.
    Graceful shutdown waits on this, not just the engine: after a row's
    tokens arrive, the handler thread still renders the WAV and writes
    the response — exiting on engine-drain alone would reset exactly the
    clients the drain was protecting (daemon handler threads are not
    joined by server_close)."""

    def __init__(self):
        self._n = 0
        self._lock = threading.Lock()

    def __enter__(self):
        with self._lock:
            self._n += 1

    def __exit__(self, *exc):
        with self._lock:
            self._n -= 1

    def wait_zero(self, timeout: float) -> bool:
        import time as _time

        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            with self._lock:
                if self._n == 0:
                    return True
            _time.sleep(0.05)
        with self._lock:
            return self._n == 0


class EAMGHandler(BaseHTTPRequestHandler):
    pipeline: Pipeline = None  # injected by make_server
    quiet: bool = True
    stats: LatencyStats = None
    logger: JsonLogger = None
    inflight: _InflightCounter = None

    # -- plumbing ----------------------------------------------------------

    def log_message(self, fmt, *args):  # noqa: N802
        if not self.quiet:
            super().log_message(fmt, *args)

    def _send(self, code: int, body: bytes, content_type: str,
              extra: dict | None = None):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in {**_CORS, **(extra or {})}.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    # -- routes -------------------------------------------------------------

    def do_OPTIONS(self):  # noqa: N802
        self._send(204, b"", "text/plain")

    def do_GET(self):  # noqa: N802
        path = urllib.parse.urlparse(self.path).path
        if path in ("/", "/index.html"):
            page = (_STATIC_DIR / "index.html").read_bytes()
            self._send(200, page, "text/html; charset=utf-8")
        elif path == "/healthz":
            self._json(200, {"status": "ok"})
        elif path == "/stats":
            out = self.stats.summary()
            # medusa admission probe (VERDICT r4 #5): operators see the
            # predicted tok/verify vs the verify-premium floor, i.e.
            # whether medusa=true wins or loses on THIS checkpoint
            probe = getattr(self.pipeline, "medusa_probe", None)
            if probe is not None:
                out["medusa_probe"] = probe
            batcher = getattr(self.pipeline, "batcher", None)
            if batcher is not None and hasattr(batcher, "stats"):
                eng = {k: v for k, v in batcher.stats.items()
                       if isinstance(v, (int, float))}
                # snapshot before sorting: the engine worker appends to
                # this deque concurrently, and iterating a mutating deque
                # raises RuntimeError. list() can race the same way, so
                # retry the O(us) copy rather than lock the hot append.
                jd = batcher.stats.get("join_delay_ms")
                for _ in range(8):
                    try:
                        jd = list(jd) if jd is not None else []
                        break
                    except RuntimeError:
                        continue
                else:
                    jd = []
                if jd:
                    js = sorted(jd)
                    eng["p50_join_ms"] = round(js[len(js) // 2], 1)
                    eng["p95_join_ms"] = round(
                        js[min(len(js) - 1, int(len(js) * 0.95))], 1)
                # live load: what an operator tunes --slots/--max-queue by
                eng["queue_depth"] = batcher._q.qsize()
                if hasattr(batcher, "_free"):
                    eng["free_slots"] = len(batcher._free)
                out["engine"] = eng
            self._json(200, out)
        elif path == "/profile":
            # capture a jax.profiler trace of one representative request
            import tempfile

            from ..utils.logging import profiler_trace

            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path)
                                       .query)
            out_dir = qs.get("dir", [tempfile.mkdtemp(
                prefix="eamg_profile_")])[0]
            with profiler_trace(out_dir):
                self.pipeline.generate("profile trace request", seed=0,
                                       render_audio=False)
            self._json(200, {"trace_dir": out_dir,
                             "view": "tensorboard --logdir " + out_dir})
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):  # noqa: N802
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path != "/generate":
            self._json(404, {"error": "not found"})
            return
        with self.inflight:
            self._generate(parsed)

    def _generate(self, parsed):
        try:
            # body hardening: malformed framing/encoding -> 400, oversize
            # -> 413, bad field values -> 422; a fuzzer must never see 500
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "bad Content-Length"})
                return
            if length > MAX_BODY_BYTES:
                # drain (bounded) before responding: responding while the
                # client is still writing resets the connection and the
                # client sees a broken pipe instead of the 413
                remaining = min(length, 16 << 20)
                while remaining > 0:
                    chunk = self.rfile.read(min(remaining, 1 << 16))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                self._json(413, {"error": "request body too large"})
                return
            body = self.rfile.read(max(length, 0))
            ctype = self.headers.get("Content-Type", "")
            try:
                if ctype.startswith("multipart/form-data"):
                    fields = _parse_multipart(body, ctype)
                else:
                    fields = {k: v[0] for k, v in
                              urllib.parse.parse_qs(
                                  body.decode()).items()}
            except Exception:
                self._json(400, {"error": "malformed request body"})
                return
            prompt = fields.get("prompt", "")
            if not prompt:
                self._json(422, {"error": "form field 'prompt' required"})
                return
            if len(prompt) > MAX_PROMPT_CHARS:
                self._json(422, {"error": f"prompt too long "
                                          f"(max {MAX_PROMPT_CHARS} "
                                          f"chars)"})
                return
            qs = urllib.parse.parse_qs(parsed.query)
            fmt = qs.get("format", [fields.get("format", "wav")])[0]
            seed = fields.get("seed")
            import time as _time

            t_start = _time.perf_counter()
            # sections=true: per-sentence emotion -> per-section conditioned
            # music (pipeline.generate_sections)
            sections = fields.get("sections", "").lower() in ("1", "true",
                                                              "yes")
            stream = qs.get("stream", [fields.get("stream", "")])[0] \
                .lower() in ("1", "true", "yes")
            # validate EVERY numeric field up front: a malformed value
            # must 422 before any work (and before a stream's 200 header
            # is committed)
            try:
                sampling = dict(
                    temperature=_num(fields, "temperature", 1.0, float),
                    top_k=_num(fields, "top_k", 50, int),
                    top_p=_num(fields, "top_p", 1.0, float),
                    min_p=_num(fields, "min_p", 0.0, float),
                    penalties=_parse_penalties(fields),
                    no_repeat_ngram=_parse_ngram(fields),
                    grammar=_parse_grammar(fields),
                    seed=_num(fields, "seed", None, int))
                # deterministic beam search (VERDICT r4 #8): solo decode,
                # 0 = off; length_penalty only meaningful with beams
                beams = _num(fields, "beams", 0, int)
                length_penalty = _num(fields, "length_penalty", 1.0,
                                      float)
                if beams < 0 or beams > 16:
                    raise ValueError("beams must be in [0, 16]")
            except ValueError as exc:
                self._json(422, {"error": str(exc)})
                return
            lookup = fields.get("lookup", "").lower() in ("1", "true",
                                                          "yes")
            medusa = fields.get("medusa", "").lower() in ("1", "true",
                                                          "yes")
            if lookup and stream:
                self._json(422, {"error": "lookup does not stream yet "
                                          "(whole-block speculation)"})
                return
            if beams and stream:
                self._json(422, {"error": "beams is a whole-block "
                                          "deterministic search; it does "
                                          "not stream"})
                return
            if stream:
                if medusa and (sampling["penalties"] is not None
                               or sampling["no_repeat_ngram"]
                               or sampling["grammar"]):
                    # fail before committing the 200 event-stream header
                    self._json(422, {"error": "medusa does not compose "
                                              "with penalties, n-gram "
                                              "bans or grammar"})
                    return
                if medusa and self.pipeline.medusa_heads is None:
                    self._json(422, {"error": getattr(
                        self.pipeline, "medusa_unavailable", None)
                        or "this serving checkpoint ships no Medusa "
                           "heads"})
                    return
                self._stream_generate(prompt, sampling, fmt, sections,
                                      t_start, medusa=medusa)
                return
            gen_fn = (self.pipeline.generate_sections if sections
                      else self.pipeline.generate)
            try:
                result = gen_fn(
                    prompt, render_audio=fmt == "wav", lookup=lookup,
                    medusa=medusa, beams=beams,
                    length_penalty=length_penalty, **sampling)
            except ValueError as exc:
                # invalid request composition (e.g. lookup + grammar,
                # medusa without shipped heads, or speculation on a
                # reference-quirk checkpoint)
                self._json(422, {"error": str(exc)})
                return
            self.stats.observe(_time.perf_counter() - t_start,
                               tokens=len(result.tokens))
            self.logger.log("generate", emotion=result.label,
                            n_tokens=len(result.tokens),
                            timings_ms={k: round(v, 1) for k, v in
                                        result.timings_ms.items()})
            timings = json.dumps(
                {k: round(v, 1) for k, v in result.timings_ms.items()})
            extra = {"X-EAMG-Timings": timings,
                     "X-EAMG-Emotion": result.label}
            if fmt == "midi":
                extra["Content-Disposition"] = \
                    'attachment; filename="generated.mid"'
                self._send(200, result.midi_bytes, "audio/midi", extra)
            else:
                extra["Content-Disposition"] = \
                    'attachment; filename="generated.wav"'
                self._send(200, result.wav_bytes, "audio/wav", extra)
        except EngineOverloaded as exc:
            # load shedding: the engine's admission queue is full — tell
            # the client to back off instead of queueing without bound
            self._send(503, json.dumps({"error": str(exc)}).encode(),
                       "application/json", {"Retry-After": "1"})
        except Exception as exc:  # pragma: no cover - defensive
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    def _stream_generate(self, prompt, sampling, fmt, sections, t_start,
                         medusa: bool = False):
        """``POST /generate?stream=1`` -> Server-Sent Events: meta /
        token-delta events as compiled chunks complete, then a final done
        event with the MIDI (and WAV) as base64 (pipeline.generate_stream).
        The reference's client saw nothing until the full WAV arrived.
        ``sampling`` arrives pre-validated from _generate (fuzz contract:
        a malformed numeric field 422s before the 200 event-stream
        header is committed)."""
        import time as _time

        # decide overload BEFORE committing to a 200 event-stream (a race
        # between this check and the row's enqueue degrades to an SSE
        # "error" event, which streaming clients already handle). Only
        # streams that would actually ride the engine are shed — window
        # mode and param-mismatched streams decode solo (_stream_deltas)
        # and never touch the queue.
        from .continuous import ContinuousBatcher

        batcher = getattr(self.pipeline, "batcher", None)
        if isinstance(batcher, ContinuousBatcher) \
                and batcher.accepts(
                    top_k=sampling["top_k"], top_p=sampling["top_p"],
                    min_p=sampling["min_p"],
                    penalties=sampling["penalties"],
                    no_repeat_ngram=sampling["no_repeat_ngram"],
                    grammar=sampling["grammar"]) \
                and batcher.overloaded():
            batcher.stats["rejected"] += 1
            self._send(503, json.dumps(
                {"error": "engine admission queue full"}).encode(),
                "application/json", {"Retry-After": "1"})
            return
        self.send_response(200)
        for k, v in {**_CORS, "Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}.items():
            self.send_header(k, v)
        self.end_headers()
        n_tokens = 0
        label = ""
        stream = self.pipeline.generate_stream(
            prompt, render_audio=fmt == "wav", sections=sections,
            medusa=medusa, **sampling)
        try:
            for ev in stream:
                if ev["event"] == "done":
                    n_tokens, label = ev["n_tokens"], ev["label"]
                self.wfile.write(b"data: " + json.dumps(ev).encode()
                                 + b"\n\n")
                self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            # client went away mid-stream: the finally's close() throws
            # GeneratorExit down the generator chain, which cancels the
            # engine row so the slot frees instead of decoding to
            # completion
            return
        except Exception as exc:  # pragma: no cover - defensive
            err = {"event": "error",
                   "error": f"{type(exc).__name__}: {exc}"}
            try:
                self.wfile.write(b"data: " + json.dumps(err).encode()
                                 + b"\n\n")
            except OSError:
                pass
            return
        finally:
            stream.close()
        self.stats.observe(_time.perf_counter() - t_start, tokens=n_tokens)
        self.logger.log("generate_stream", emotion=label,
                        n_tokens=n_tokens)


def make_server(pipeline: Pipeline, host: str = "127.0.0.1",
                port: int = 8000, quiet: bool = True) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (EAMGHandler,),
                   {"pipeline": pipeline, "quiet": quiet,
                    "stats": LatencyStats(),
                    "logger": JsonLogger(component="serve"),
                    "inflight": _InflightCounter()})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def main():  # pragma: no cover - CLI entry
    import argparse

    parser = argparse.ArgumentParser(description="EAMG-TPU music service")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir (utils.checkpoint format); "
                             "omit for the synthetic demo model")
    parser.add_argument("--random-demo", action="store_true",
                        help="serve the randomly-initialized demo model "
                             "even when the packaged trained demo "
                             "checkpoint is present")
    parser.add_argument("--full-gm", action="store_true",
                        help="map all instrument families, not just the "
                             "reference's three")
    parser.add_argument("--coalesce", nargs="?", const="continuous",
                        default=False,
                        choices=[True, False, "window", "continuous"],
                        help="batch concurrent requests into one ragged "
                             "decode (requires a causal model). "
                             "'--coalesce' / '--coalesce continuous' = "
                             "persistent engine, requests join a RUNNING "
                             "decode mid-generation (wins every measured "
                             "traffic shape); '--coalesce window' = 10 ms "
                             "grouping window")
    parser.add_argument("--slots", type=int, default=None,
                        help="continuous engine: concurrent request rows "
                             "(default 8); window mode: max batch size")
    parser.add_argument("--chunk", type=int, default=None,
                        help="continuous engine: compiled steps between "
                             "admission/harvest boundaries (default 128 "
                             "via the checkpoint loader; smaller = "
                             "faster join + finer streaming deltas, "
                             "larger = less host sync overhead)")
    parser.add_argument("--fast-routing", action="store_true",
                        help="idle-engine bypassed rows use the batch-1 "
                             "one-shot program: ~70 ms lower p50, but "
                             "same-seed bytes can differ by load shape "
                             "on TPU (near-tie argmax flips across "
                             "compiled programs). Default: strict "
                             "cross-load byte determinism")
    parser.add_argument("--engine-medusa", action="store_true",
                        help="compile the checkpoint's medusa heads "
                             "INTO the continuous engine (per-row "
                             "speculation; measured 0.48-0.85x on every "
                             "artifact and taxes plain traffic — "
                             "default off; medusa=true requests decode "
                             "solo)")
    parser.add_argument("--max-queue", type=int, default=None,
                        help="admission-queue bound before requests are "
                             "shed with 503 (default 256; 0 = unbounded)")
    parser.add_argument("--engine-top-p", default=None,
                        help="continuous engine nucleus mode: a float "
                             "compiles the shared decode for that fixed "
                             "mass (mismatching requests decode solo); "
                             "'row' compiles per-row top-p AND min-p "
                             "filtering so EVERY request's values ride "
                             "the engine (neutral values stay bit-exact "
                             "unfiltered)")
    parser.add_argument("--engine-ngram", type=int, default=0,
                        help="continuous engine: compile an n-gram ban of "
                             "this size into the shared decode; requests "
                             "asking no_repeat_ngram=N ride the engine "
                             "(per-row on/off bit, plain rows stay "
                             "bit-exact); other sizes decode solo")
    parser.add_argument("--engine-grammar", action="store_true",
                        help="compile the served scheme's decoding FSM "
                             "(decode/grammar.py) into the batcher so "
                             "requests asking grammar=true ride the shared "
                             "decode (per-row on/off bit, plain rows stay "
                             "bit-exact); without it grammar requests "
                             "decode solo")
    args = parser.parse_args()

    coalesce_opts = {}
    if args.coalesce == "continuous" or args.coalesce is True:
        if args.slots is not None:
            coalesce_opts["slots"] = args.slots
        if args.chunk is not None:
            coalesce_opts["chunk"] = args.chunk
        if args.engine_top_p == "row":
            coalesce_opts["per_row_sampling"] = True
        elif args.engine_top_p is not None:
            coalesce_opts["top_p"] = float(args.engine_top_p)
        if args.engine_ngram:
            coalesce_opts["no_repeat_ngram"] = int(args.engine_ngram)
    elif args.coalesce and args.slots is not None:
        coalesce_opts["max_batch"] = args.slots
    if args.coalesce and args.engine_grammar:
        coalesce_opts["grammar"] = True
    if args.coalesce and args.max_queue is not None:
        coalesce_opts["max_queue"] = args.max_queue

    from .pipeline import packaged_demo_checkpoint, pipeline_from_checkpoint

    ckpt_dir = args.checkpoint or (not args.random_demo
                                   and packaged_demo_checkpoint())
    if ckpt_dir:
        # scheme (A text-token vs B3 control-token) inferred from the
        # checkpoint's vocabulary
        pipeline = pipeline_from_checkpoint(ckpt_dir, full_gm=args.full_gm,
                                            coalesce=args.coalesce,
                                            coalesce_opts=coalesce_opts,
                                            engine_medusa=args.
                                            engine_medusa,
                                            fast_routing=args.
                                            fast_routing)
        print(f"serving checkpoint {ckpt_dir} "
              f"(scheme {pipeline.scheme})")
    else:
        from .pipeline import demo_pipeline

        # --coalesce needs the corrected causal demo architecture.
        # (--engine-medusa is meaningless here: the random demo ships
        # no heads; say so instead of silently ignoring the flag)
        if args.engine_medusa:
            print("[serve] --engine-medusa ignored: the random demo "
                  "pipeline has no medusa heads")
        pipeline = demo_pipeline(corrected=args.coalesce,
                                 coalesce=args.coalesce,
                                 coalesce_opts=coalesce_opts,
                                 fast_routing=args.fast_routing)
    print("warming up (first compile)...")
    pipeline.warmup()
    server = make_server(pipeline, args.host, args.port, quiet=False)
    print(f"EAMG-TPU serving on http://{args.host}:{args.port}")

    # graceful shutdown: SIGTERM/SIGINT stop the accept loop, in-flight
    # engine rows drain, then the worker thread is joined (killing it
    # mid-jax-call aborts the process)
    import signal

    def _graceful(signum, frame):
        print(f"signal {signum}: draining (send again to force-quit)...",
              flush=True)
        # second signal falls through to the default action so a wedged
        # drain can still be interrupted
        signal.signal(signum, signal.SIG_DFL)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    try:
        server.serve_forever()
    finally:
        batcher = getattr(pipeline, "batcher", None)
        if batcher is not None:
            if hasattr(batcher, "drain"):
                batcher.drain(timeout=60)
        # engine rows done != responses written: handlers still render
        # WAVs after their tokens arrive (see _InflightCounter)
        server.RequestHandlerClass.inflight.wait_zero(timeout=60)
        if batcher is not None and hasattr(batcher, "close"):
            batcher.close()
        server.server_close()
        print("drained; bye")


if __name__ == "__main__":  # pragma: no cover
    main()
