#!/usr/bin/env python
"""HTTP synthesis server over the compiled bucketed pipeline.

Production-serving front door the reference lacks (its only inference
surface is the one-shot scripts/synthesize.py CLI). Stdlib-only
(ThreadingHTTPServer + json), so it adds no dependencies:

  GET  /healthz            → {"status": "ok", device, backend, params}
  POST /synthesize         → audio/wav bytes
        body: {"text": str, "duration_scale": float = 1.0,
               "format": "pcm16"|"mulaw"}
        "mulaw" ships G.711 μ-law WAV (format tag 7): half the bytes per
        sample, companded ON DEVICE so the device→host link — the
        serving bottleneck (DESIGN.md §3) — carries half the traffic.
        Every route below honors the same "format" field.
  POST /synthesize_batch   → {"results": [{"audio_b64": wav-bytes-b64,
        body: {"texts": [str], ...}    "seconds": float}, ...]}
  POST /reload             → zero-downtime checkpoint rollout: swaps the
        body: {"checkpoint": dir,      serving weights in place with NO
               "step": int|"best"}     recompilation (the compiled graphs
                                       take params as an argument)
  POST /synthesize_stream  → audio/wav, Transfer-Encoding: chunked —
        body: {"text": str, ...}       first audio chunk is sent as soon
        as the chunked vocoder produces it (low-latency path; the
        payload is a streaming WAV with unknown-length headers). Texts
        of any length: over-budget texts sentence-split and stream in
        sequence, so first-chunk latency stays one sentence.

Requests are funneled through a lock into the Synthesizer so concurrent
clients share the same compiled graphs. With --dynamic-batch, concurrent
/synthesize requests are additionally coalesced into one batched device
dispatch (m2tts_tpu/serving/batcher.py: up to max-batch-bucket requests
per --batch-wait-ms straggler window) — the chip synthesizes a 64-wide
batch for barely more than one utterance, so coalescing multiplies
multi-client throughput without clients having to batch themselves.
--dynamic-batch also routes /synthesize_stream through a StreamBatcher
(m2tts_tpu/serving/stream_batcher.py): concurrent streams share batched
acoustic and per-chunk vocoder dispatches, so concurrent streaming
capacity scales with the batch bucket instead of dividing by it.

Usage:
  python scripts/serve.py --checkpoint outputs/stage1/checkpoints --port 8080
  python scripts/serve.py --random-init --config configs/flagship_tpu.yaml  # demo
"""

import argparse
import base64
import io
import json
import queue
import sys
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def wav_bytes(pcm16, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


def wav_stream_header(sample_rate: int) -> bytes:
    """44-byte PCM16-mono WAV header with unknown (max) data length —
    the streaming-WAV convention: players read until the stream ends."""
    import struct

    unknown = 0xFFFFFFFF
    return (b"RIFF" + struct.pack("<I", unknown) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", unknown))


def wav_bytes_mulaw(data: bytes | bytearray, sample_rate: int,
                    n_samples=None) -> bytes:
    """G.711 μ-law mono WAV (format tag 7). Non-PCM WAV needs the
    18-byte fmt variant (cbSize=0) plus a fact chunk with the sample
    count; stdlib ``wave`` is PCM-only, so this is hand-rolled."""
    import struct

    data = bytes(data)
    if n_samples is None:
        n_samples = len(data)
    body = (b"WAVEfmt "
            + struct.pack("<IHHIIHHH", 18, 7, 1, sample_rate,
                          sample_rate, 1, 8, 0)
            + b"fact" + struct.pack("<II", 4, n_samples)
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_stream_header_mulaw(sample_rate: int) -> bytes:
    """μ-law streaming WAV header (unknown lengths, as wav_stream_header)."""
    import struct

    unknown = 0xFFFFFFFF
    return (b"RIFF" + struct.pack("<I", unknown) + b"WAVEfmt "
            + struct.pack("<IHHIIHHH", 18, 7, 1, sample_rate,
                          sample_rate, 1, 8, 0)
            + b"fact" + struct.pack("<II", 4, unknown)
            + b"data" + struct.pack("<I", unknown))


def _mulaw_bytes_of(r) -> bytes:
    """μ-law payload of a synthesis result: device-companded bytes when
    the mulaw graph produced them, host table-encode otherwise (the
    long-form path assembles float audio on the host)."""
    if "audio_mulaw" in r:
        return r["audio_mulaw"].tobytes()
    from m2tts_tpu.ops.audio_codec import mulaw_encode_np

    return mulaw_encode_np(r["audio_pcm"]).tobytes()


def make_handler(synth, info, stream_chunk_frames: int = 64,
                 dynamic_batch_wait_ms=None, warmup_streams=False):
    lock = threading.Lock()
    batcher = None
    if dynamic_batch_wait_ms is not None:
        # coalesce concurrent /synthesize requests into one batched
        # dispatch (shares the device lock with the other routes)
        from m2tts_tpu.serving.batcher import DynamicBatcher

        batcher = DynamicBatcher(synth, lock=lock,
                                 max_wait_ms=dynamic_batch_wait_ms)
    streamer = {}  # lazy singletons: built on the first /synthesize_stream
    # two concurrent first requests must not each build one (multi-second
    # compiles, and the loser's worker threads would leak)
    streamer_mu = threading.Lock()

    def get_streamer():
        with streamer_mu:
            return _get_streamer_locked()

    def _get_streamer_locked():
        if "ss" not in streamer:
            import numpy as np  # noqa: F401 (handler-scope import)

            from m2tts_tpu.serving.streaming import StreamingSynthesizer

            streamer["ss"] = StreamingSynthesizer(
                synth.model, synth.params,
                chunk_frames=stream_chunk_frames,
                max_frames=max(synth.frame_buckets),
                text_bucket=max(synth.text_buckets),
                vocoder_backend=synth.vocoder_backend,
                compute_dtype=synth.compute_dtype,
                sample_rate=synth.sample_rate)
        return streamer["ss"]

    def get_stream_batcher():
        # concurrent streams share batched acoustic + chunk dispatches
        # (m2tts_tpu/serving/stream_batcher.py); built only under
        # --dynamic-batch, mirroring the /synthesize batcher
        with streamer_mu:
            if "sb" not in streamer:
                from m2tts_tpu.serving.stream_batcher import StreamBatcher

                streamer["sb"] = StreamBatcher(
                    _get_streamer_locked(), lock=lock,
                    max_wait_ms=dynamic_batch_wait_ms)
            return streamer["sb"]

    if warmup_streams and dynamic_batch_wait_ms is not None:
        # cold arrival interleavings otherwise pay one compile per new
        # batch bucket mid-request
        n = get_stream_batcher().warmup()
        print(f"warmed {n} streaming graphs", flush=True)

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer-encoding (the streaming route) is an HTTP/1.1
        # construct; advertising it on an HTTP/1.0 status line makes
        # version-honoring clients read the raw chunk framing as body
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                raise ValueError("empty request body")
            return json.loads(self.rfile.read(n))

        def do_GET(self):
            if self.path == "/healthz":
                stats = {}
                if batcher is not None:
                    stats["batched_requests_served"] = batcher.requests_served
                    stats["batches_run"] = batcher.batches_run
                if "sb" in streamer:
                    sb = streamer["sb"]
                    stats["streams_served"] = sb.streams_served
                    stats["stream_chunk_dispatches"] = sb.chunk_dispatches
                    stats["stream_chunks_emitted"] = sb.chunks_emitted
                self._json(200, {"status": "ok", **info, **stats})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                req = self._read_body()
            except (ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request body: {e}"})
                return
            try:
                try:
                    scale = float(req.get("duration_scale", 1.0))
                except (TypeError, ValueError):
                    self._json(400, {"error": "'duration_scale' must be a number"})
                    return
                fmt = req.get("format", "pcm16")
                if fmt not in ("pcm16", "mulaw"):
                    self._json(400, {"error": "'format' must be 'pcm16' or "
                                              "'mulaw'"})
                    return
                mulaw = fmt == "mulaw"
                pcm_format = "mulaw" if mulaw else "int16"
                if self.path == "/synthesize":
                    text = req.get("text")
                    if not text or not isinstance(text, str):
                        self._json(400, {"error": "'text' (string) required"})
                        return
                    n = len(synth.text_processor.text_to_phonemes(text))
                    if n > synth.phoneme_budget() - 2:
                        with lock:  # needs chunking, not batching
                            r = synth.synthesize_long(text, scale)
                    elif batcher is not None:
                        r = batcher.submit(text, scale,
                                           pcm_format=pcm_format)
                    else:
                        with lock:
                            r = synth.synthesize_batch(
                                [text], scale, pcm_format=pcm_format)[0]
                    body = (wav_bytes_mulaw(_mulaw_bytes_of(r),
                                            synth.sample_rate) if mulaw
                            else wav_bytes(r["audio_pcm"],
                                           synth.sample_rate))
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/synthesize_stream":
                    text = req.get("text")
                    if not text or not isinstance(text, str):
                        self._json(400, {"error": "'text' (string) required"})
                        return
                    import numpy as np

                    # Chunks are produced on the device decoupled from the
                    # client write loop, so a slow or stalled reader can
                    # never wedge the device lock. Without --dynamic-batch
                    # a worker thread produces the whole utterance at
                    # device speed into an unbounded queue (a whole
                    # utterance of int16 PCM is small — the batch route
                    # buffers the same). With --dynamic-batch, the
                    # StreamBatcher's scheduler is that producer, shared
                    # across concurrent streams.
                    chunk_q = queue.SimpleQueue()

                    if batcher is not None:
                        # raises before headers are sent on admission
                        # failure, falling to the outer _json(500)
                        sb_iter = get_stream_batcher().stream(text, scale)

                        def produce():
                            try:
                                for c in sb_iter:
                                    chunk_q.put(("chunk", c))
                                chunk_q.put(("done", None))
                            except BaseException as e:
                                chunk_q.put(("error", e))
                    else:
                        def produce():
                            try:
                                with lock:
                                    for c in get_streamer().stream(text,
                                                                   scale):
                                        chunk_q.put(("chunk", c))
                                chunk_q.put(("done", None))
                            except BaseException as e:
                                chunk_q.put(("error", e))

                    producer = threading.Thread(target=produce, daemon=True)
                    producer.start()
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def write_chunk(b: bytes):
                        self.wfile.write(f"{len(b):X}\r\n".encode())
                        self.wfile.write(b)
                        self.wfile.write(b"\r\n")

                    # Headers are already sent, so a mid-stream error can
                    # only terminate the chunked body early — it must NOT
                    # fall through to the outer _json(500), which would
                    # append a second HTTP response to this connection.
                    try:
                        write_chunk(wav_stream_header_mulaw(synth.sample_rate)
                                    if mulaw
                                    else wav_stream_header(synth.sample_rate))
                        if mulaw:
                            from m2tts_tpu.ops.audio_codec import \
                                mulaw_encode_np
                        while True:
                            kind, payload = chunk_q.get()
                            if kind == "chunk":
                                pcm = (np.clip(payload, -1.0, 1.0)
                                       * 32767.0).astype(np.int16)
                                # host table-encode per chunk: the stream
                                # graphs emit float windows, and halving
                                # the HTTP bytes still matters to clients
                                write_chunk(mulaw_encode_np(pcm).tobytes()
                                            if mulaw else pcm.tobytes())
                            elif kind == "error":
                                print(f"stream synthesis failed: {payload!r}",
                                      flush=True)
                                break
                            else:
                                break
                        self.wfile.write(b"0\r\n\r\n")
                    except OSError as e:  # client went away mid-stream
                        print(f"stream client dropped: {e!r}", flush=True)
                        self.close_connection = True
                    return
                elif self.path == "/reload":
                    # zero-downtime checkpoint rollout: the compiled
                    # graphs take params as an argument, so the swap
                    # needs no recompilation; streaming singletons are
                    # rebuilt lazily (in-flight streams drain on the old
                    # weights)
                    ck = req.get("checkpoint")
                    if not ck or not isinstance(ck, str):
                        self._json(400, {"error": "'checkpoint' (string "
                                                  "dir) required"})
                        return
                    from m2tts_tpu.utils.checkpoint import load_for_inference

                    try:
                        params, _cfg, step = load_for_inference(
                            ck, req.get("step"))
                        with lock:
                            synth.swap_params(params)
                    except (ValueError, FileNotFoundError) as e:
                        self._json(400, {"error": str(e)})
                        return
                    with streamer_mu:
                        old_sb = streamer.pop("sb", None)
                        streamer.pop("ss", None)
                    if old_sb is not None:
                        old_sb.close()
                    self._json(200, {"status": "reloaded",
                                     "checkpoint": ck, "step": step})
                elif self.path == "/synthesize_batch":
                    texts = req.get("texts")
                    if (not isinstance(texts, list) or not texts
                            or not all(isinstance(t, str) and t for t in texts)):
                        self._json(400, {"error": "'texts' (non-empty list "
                                                  "of strings) required"})
                        return
                    budget = synth.phoneme_budget() - 2
                    over = any(
                        len(synth.text_processor.text_to_phonemes(t)) > budget
                        for t in texts)
                    with lock:
                        # over-budget texts would silently truncate
                        # mid-utterance through the plain batch path (the
                        # /synthesize route already guards this)
                        results = (synth.synthesize_batch_long(texts, scale)
                                   if over
                                   else synth.synthesize_batch(
                                       texts, scale, pcm_format=pcm_format))

                    def _wav(r):
                        if mulaw:
                            return wav_bytes_mulaw(_mulaw_bytes_of(r),
                                                   synth.sample_rate)
                        return wav_bytes(r["audio_pcm"], synth.sample_rate)

                    out = [{"audio_b64": base64.b64encode(_wav(r)).decode(),
                            "seconds": (len(r["audio_pcm"])
                                        if "audio_pcm" in r
                                        else len(r["audio_mulaw"]))
                                       / synth.sample_rate}
                           for r in results]
                    self._json(200, {"results": out})
                else:
                    self._json(404, {"error": f"no route {self.path}"})
            except Exception as e:  # keep the server alive
                self._json(500, {"error": str(e)})

    return Handler


def build_synthesizer(args):
    from m2tts_tpu.serving import pipeline

    kwargs = {"compute_dtype": getattr(args, "compute_dtype", "auto")}
    n = int(getattr(args, "data_parallel", 1) or 1)
    if n > 1:
        # multi-chip serving: shard the batch axis over a pure-data mesh;
        # batch buckets must divide by the mesh, so scale the default set
        from m2tts_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(data=n)
        kwargs["batch_buckets"] = (n, 4 * n, 16 * n)
    if args.checkpoint:
        return pipeline.from_checkpoint(
            args.checkpoint, vocoder_backend=args.vocoder_backend, **kwargs)
    if args.torch_checkpoint:
        return pipeline.from_torch_checkpoint(
            args.torch_checkpoint, vocoder_backend=args.vocoder_backend,
            **kwargs)
    if args.random_init:
        from m2tts_tpu.utils.config import load_config

        return pipeline.from_config(load_config(args.config),
                                    vocoder_backend=args.vocoder_backend,
                                    **kwargs)
    raise SystemExit("one of --checkpoint / --torch-checkpoint / "
                     "--random-init is required")


def main(argv=None):
    p = argparse.ArgumentParser(description="m2tts_tpu HTTP synthesis server")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--torch-checkpoint", type=str, default=None)
    p.add_argument("--random-init", action="store_true",
                   help="untrained demo model from --config")
    p.add_argument("--config", type=str, default="configs/flagship_tpu.yaml")
    p.add_argument("--vocoder-backend", type=str, default="auto")
    p.add_argument("--compute-dtype", type=str, default="auto",
                   choices=("auto", "bf16", "f32"),
                   help="serving-graph compute dtype (auto = bf16 on TPU)")
    p.add_argument("--data-parallel", type=int, default=1, metavar="N",
                   help="shard request batches over an N-chip 'data' mesh "
                        "(requires N visible devices)")
    p.add_argument("--stream-chunk-frames", type=int, default=64,
                   help="mel frames per /synthesize_stream vocoder chunk")
    p.add_argument("--dynamic-batch", action="store_true",
                   help="coalesce concurrent /synthesize requests into one "
                        "batched dispatch (straggler window: "
                        "--batch-wait-ms)")
    p.add_argument("--batch-wait-ms", type=float, default=10.0,
                   help="straggler-collection window for --dynamic-batch")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--warmup", action="store_true",
                   help="compile the single-stream buckets before serving")
    p.add_argument("--warmup-all", action="store_true",
                   help="pre-compile EVERY reachable (batch x text x frame) "
                        "bucket combination plus duration probes — no "
                        "request ever pays a first compile, but startup can "
                        "take many minutes (each graph is 4-30s on tunneled "
                        "TPU hosts)")
    args = p.parse_args(argv)

    from m2tts_tpu.utils.device import (enable_persistent_compile_cache,
                                        honor_platform_env)
    honor_platform_env()
    enable_persistent_compile_cache()

    import jax

    synth = build_synthesizer(args)
    if args.warmup or args.warmup_all:
        n = synth.warmup(full=args.warmup_all)
        print(f"warmed {n} serving graphs", flush=True)
    info = {"device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
            "vocoder_backend": synth.vocoder_backend,
            "compute_dtype": synth.compute_dtype,
            "sample_rate": synth.sample_rate}
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(synth, info,
                     stream_chunk_frames=args.stream_chunk_frames,
                     dynamic_batch_wait_ms=(args.batch_wait_ms
                                            if args.dynamic_batch else None),
                     warmup_streams=args.warmup or args.warmup_all))
    print(f"serving on http://{args.host}:{server.server_address[1]}  {info}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
