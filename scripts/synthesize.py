#!/usr/bin/env python
"""Text → waveform synthesis CLI.

Reproduces the reference CLI surface (reference scripts/synthesize.py:
--text --checkpoint --output --duration-scale --sample-rate) on the
compiled TPU pipeline, plus:

  --torch-checkpoint  load a reference PyTorch checkpoint directly
                      (converted on the fly)
  --batch-file        synthesize one WAV per line of a text file in a
                      single bucketed batch
  --griffin-lim       skip the vocoder and invert the mel on the host
                      (pre-vocoder validation path)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))




def _parse_step(step):
    """--step: int, 'best' (best-validation pin), or None (latest)."""
    if step in (None, "", "latest"):
        return None
    return step if step == "best" else int(step)

def main(argv=None):
    p = argparse.ArgumentParser(description="m2tts_tpu synthesis")
    p.add_argument("--text", type=str, default=None, help="Text to synthesize")
    p.add_argument("--batch-file", type=str, default=None,
                   help="File with one utterance per line")
    p.add_argument("--step", type=str, default=None,
                   help="checkpoint step to load: an int, 'best', or latest (default)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="m2tts_tpu (orbax) checkpoint directory")
    p.add_argument("--torch-checkpoint", type=str, default=None,
                   help="reference PyTorch .pt checkpoint to convert")
    p.add_argument("--output", type=str, default="output.wav")
    p.add_argument("--duration-scale", type=float, default=1.0)
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--griffin-lim", action="store_true",
                   help="invert mel with Griffin-Lim instead of the vocoder")
    p.add_argument("--vocoder-backend", type=str, default="auto",
                   choices=("auto", "xla", "mm", "pallas", "pallas_packed"),
                   help="vocoder implementation (auto resolves to the "
                        "fastest measured backend)")
    p.add_argument("--compute-dtype", type=str, default="auto",
                   choices=("auto", "bf16", "f32"),
                   help="serving-graph compute dtype (auto = bf16 on TPU)")
    p.add_argument("--streaming", action="store_true",
                   help="chunked streaming synthesis (single --text only): "
                        "prints first-chunk latency, output WAV is "
                        "bit-identical to the batch path")
    args = p.parse_args(argv)

    from m2tts_tpu.utils.device import (enable_persistent_compile_cache,
                                        honor_platform_env)
    honor_platform_env()
    enable_persistent_compile_cache()

    if args.text is None and args.batch_file is None:
        p.error("one of --text / --batch-file is required")
    if args.checkpoint is None and args.torch_checkpoint is None:
        p.error("one of --checkpoint / --torch-checkpoint is required")

    from m2tts_tpu.frontend.audio import AudioProcessor, save_wav
    from m2tts_tpu.serving import pipeline

    if args.checkpoint:
        synth = pipeline.from_checkpoint(args.checkpoint,
                                         step=_parse_step(args.step),
                                         vocoder_backend=args.vocoder_backend,
                                         compute_dtype=args.compute_dtype)
    else:
        synth = pipeline.from_torch_checkpoint(
            args.torch_checkpoint, vocoder_backend=args.vocoder_backend,
            compute_dtype=args.compute_dtype)

    texts = ([args.text] if args.text is not None
             else [l.strip() for l in open(args.batch_file) if l.strip()])

    if args.streaming:
        if len(texts) != 1 or args.griffin_lim:
            p.error("--streaming requires a single --text and no "
                    "--griffin-lim")
        from m2tts_tpu.serving.streaming import StreamingSynthesizer

        ss = StreamingSynthesizer(synth.model, synth.params,
                                  vocoder_backend=synth.vocoder_backend,
                                  compute_dtype=synth.compute_dtype,
                                  sample_rate=synth.sample_rate)
        t0 = time.perf_counter()
        chunks = []
        first_ms = None
        for chunk in ss.stream(texts[0], args.duration_scale):
            if first_ms is None:
                first_ms = (time.perf_counter() - t0) * 1000.0
            chunks.append(chunk)
        elapsed = time.perf_counter() - t0
        import numpy as np

        audio = np.concatenate(chunks) if chunks else np.zeros(0, "float32")
        save_wav(audio, args.output, args.sample_rate)
        dur = len(audio) / args.sample_rate
        print(f"streamed {len(chunks)} chunks, {dur:.2f}s audio -> "
              f"{args.output}")
        print(f"first-chunk latency {first_ms:.1f} ms (incl. compile on "
              f"first call); total {elapsed:.3f}s "
              f"(RTF {elapsed / max(dur, 1e-9):.4f})")
        return 0

    t0 = time.perf_counter()
    budget = synth.phoneme_budget() - 2
    n_phon = lambda t: len(synth.text_processor.text_to_phonemes(t))
    if not args.griffin_lim and any(n_phon(t) > budget for t in texts):
        # over one bucket: sentence-chunked long-form path (otherwise the
        # frontend silently truncates to the bucket) — applies to
        # --batch-file lines too, not just single-text invocations
        results = synth.synthesize_batch_long(texts, args.duration_scale)
        n_over = sum(1 for t in texts if n_phon(t) > budget)
        n_chunks = sum(len(r["chunks"]) for r in results)
        print(f"long-form: {n_over}/{len(texts)} text(s) over the "
              f"{budget}-phoneme budget; split into {n_chunks} chunks")
    else:
        # chunk into bucket-sized groups so a batch file with more lines
        # than the largest batch bucket still yields one WAV per line
        max_b = max(synth.batch_buckets)
        results = []
        for i in range(0, len(texts), max_b):
            results.extend(synth.synthesize_batch(
                texts[i:i + max_b], args.duration_scale,
                want_mel=args.griffin_lim))
    elapsed = time.perf_counter() - t0

    out = Path(args.output)
    total_audio_sec = 0.0
    for i, (text, res) in enumerate(zip(texts, results)):
        if args.griffin_lim:
            ap = AudioProcessor(sample_rate=args.sample_rate,
                                n_mels=res["mel"].shape[-1])
            audio = ap.mel_to_audio(res["mel"].T)
        else:
            audio = res["audio"]
        path = out if len(texts) == 1 else out.with_name(
            f"{out.stem}_{i:03d}{out.suffix}")
        save_wav(audio, path, args.sample_rate)
        dur = len(audio) / args.sample_rate
        total_audio_sec += dur
        print(f"[{i}] {dur:.2f}s  {path}  ({text[:50]!r})")

    rtf = elapsed / max(total_audio_sec, 1e-9)
    print(f"Generated {total_audio_sec:.2f}s audio in {elapsed:.3f}s "
          f"(RTF {rtf:.4f}, incl. compile on first call)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
