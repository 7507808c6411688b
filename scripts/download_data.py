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
    urllib.request.urlretrieve(url, output_path, reporthook=report)
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


def build_synthetic_corpus(data_dir: Path, n: int, sample_rate: int = 22050) -> Path:
    """LJSpeech-format corpus of sine sweeps + generated sentences.

    Deterministic (seeded) so tests and CI runs are reproducible. The audio
    is not speech, but it exercises the identical ingest → mel → bucketing →
    training path as real data without network access.
    """
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from m2tts_tpu.frontend.audio import save_wav

    corpus = data_dir / f"synthetic-{n}"
    wavs = corpus / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)

    words = ("the quick brown fox jumps over a lazy dog while printing "
             "moved ahead with speech synthesis research on fast models").split()
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        dur_s = float(rng.uniform(1.0, 4.0))
        t = np.arange(int(dur_s * sample_rate)) / sample_rate
        f0 = float(rng.uniform(80, 300))
        f1 = float(rng.uniform(300, 3000))
        sweep = np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * dur_s)))
        env = np.minimum(1.0, 10 * np.minimum(t, dur_s - t))
        audio = (0.8 * sweep * env).astype(np.float32)
        fid = f"SYN{i:05d}"
        save_wav(audio, wavs / f"{fid}.wav", sample_rate)
        text = " ".join(rng.choice(words, size=rng.integers(4, 12)))
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
    p.add_argument("--subset-size", type=int, default=None,
                   help="build a first-N utterance subset after download")
    p.add_argument("--verify-only", action="store_true",
                   help="verify an existing tree; no network access")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="generate an N-utterance synthetic corpus instead of downloading")
    args = p.parse_args(argv)

    data_dir = Path(args.data_dir)

    if args.synthetic:
        build_synthetic_corpus(data_dir, args.synthetic)
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
