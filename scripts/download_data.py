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


# ---------------------------------------------------------------------------
# Corpus v3 — speech-like formant synthesis (round-5, VERDICT r4 task 2).
#
# Why v2 was not enough: its absent octave partials leave whole third-octave
# bands EMPTY, and STOI's +15 dB SDR clip makes any flat-envelope signal
# (white noise) track the clean envelope perfectly inside an empty band
# (d≈1 there) — measured utterance-level white-noise floor ~0.53, so an
# envelope-passthrough init started near the reachable ceiling and training
# could only go down (artifacts/evidence_r04/sweep_summary.md).
#
# v3 rules, each aimed at a measured failure mode:
#   1. EVERY STOI band (150 Hz – 4.3 kHz) stays continuously active: dense
#      harmonic series (not octave-spaced) + a spectral-tilt floor + shaped
#      aspiration noise. No empty bands → the SDR clip rarely binds → the
#      white-noise floor drops to the genuine decorrelation level.
#   2. Per-band envelopes come from MOVING FORMANTS (real American-English
#      vowel formant targets, consonant loci, ~40 ms coarticulated
#      transitions): a band's envelope rises when a formant sweeps in and
#      falls when it leaves, so band envelopes are mutually distinct and
#      keyed to the PHONEME SEQUENCE — the model must learn text→formant
#      placement for STOI to rise; global-energy passthrough scores low.
#   3. No interior silences (SP renders as a coarticulated schwa bridge,
#      utterance-edge SILs render at zero length): deep all-band gating was
#      v1's floor-raising mechanism.
#   4. Durations are UNIFORM within an utterance (rate varies across
#      utterances), and exactly the `length`-counted content slots are
#      rendered, so the reference's uniform-duration alignment quirk
#      (src/data/dataset.py:183-196; kept in our dataset.uniform_durations)
#      maps each id slot to its audio window with a constant one-slot
#      shift — alignment noise stops masquerading as quality loss.
#   5. Formant targets do NOT scale with the per-utterance F0 shift
#      (speaker-independent formants, like real vocal tracts vs pitch):
#      band envelopes stay predictable from text alone, so the oracle
#      (same text, different F0) stays high.
# ---------------------------------------------------------------------------

# (F1, F2, F3) targets in Hz — Peterson & Barney / Hillenbrand male means.
_VOWEL_F = {
    "IY": (270, 2290, 3010), "IH": (390, 1990, 2550),
    "EH": (530, 1840, 2480), "AE": (660, 1720, 2410),
    "AA": (730, 1090, 2440), "AO": (570, 840, 2410),
    "UH": (440, 1020, 2240), "UW": (300, 870, 2240),
    "AH": (640, 1190, 2390), "ER": (490, 1350, 1690),
}
# Diphthongs: (start, end) formant targets, interpolated across the phoneme.
_DIPHTHONG_F = {
    "EY": ((530, 1840, 2480), (390, 1990, 2550)),
    "AY": ((730, 1090, 2440), (390, 1990, 2550)),
    "AW": ((730, 1090, 2440), (440, 1020, 2240)),
    "OY": ((570, 840, 2410), (390, 1990, 2550)),
    "OW": ((570, 840, 2410), (300, 870, 2240)),
}
# Consonant recipes: class drives voicing/noise mix; loci drive transitions.
#   cls ∈ {nasal, liquid, glide, vstop, ustop, vfric, ufric, affr, asp}
#   loci: formant targets the neighbouring vowels transition toward.
#   nc/nw: fricative noise centre/width (Hz).
_CONS = {
    "M":  ("nasal", (250, 1000, 2200), None),
    "N":  ("nasal", (250, 1500, 2500), None),
    "NG": ("nasal", (250, 2000, 2700), None),
    "L":  ("liquid", (360, 1300, 2700), None),
    "R":  ("liquid", (420, 1300, 1690), None),
    "W":  ("glide", (300, 870, 2240), None),
    "Y":  ("glide", (270, 2290, 3010), None),
    "B":  ("vstop", (400, 1000, 2400), (500, 800)),
    "D":  ("vstop", (400, 1700, 2600), (3000, 2000)),
    "G":  ("vstop", (400, 2000, 2500), (1800, 1200)),
    "P":  ("ustop", (400, 1000, 2400), (700, 1000)),
    "T":  ("ustop", (400, 1700, 2600), (3800, 2500)),
    "K":  ("ustop", (400, 2000, 2500), (2000, 1500)),
    "V":  ("vfric", (400, 1000, 2400), (1500, 2500)),
    "DH": ("vfric", (400, 1600, 2500), (2000, 3000)),
    "Z":  ("vfric", (400, 1700, 2600), (4300, 2200)),
    "ZH": ("vfric", (400, 1800, 2500), (3200, 1800)),
    "F":  ("ufric", (400, 1000, 2400), (2500, 3500)),
    "TH": ("ufric", (400, 1600, 2500), (2800, 3500)),
    "S":  ("ufric", (400, 1700, 2600), (4500, 2000)),
    "SH": ("ufric", (400, 1800, 2500), (3000, 1600)),
    "CH": ("affr", (400, 1800, 2500), (3000, 1600)),
    "JH": ("affr", (400, 1800, 2500), (3200, 1800)),
    "HH": ("asp", (500, 1500, 2500), (1200, 3000)),
}
_SCHWA_F = (500, 1500, 2500)  # neutral bridge target (SP, UNK)


def _phoneme_targets(ph: str, h: int):
    """(cls, (F1,F2,F3) start, (F1,F2,F3) end, noise (centre,width) or None,
    per-formant gains) for one phoneme, with a small hash-keyed detune so
    no two phonemes are spectrally identical even within a class."""
    det = 1.0 + ((h % 13) - 6) * 0.01  # ±6 % phoneme-keyed detune
    if ph in _VOWEL_F:
        f = tuple(x * det for x in _VOWEL_F[ph])
        return "vowel", f, f, None, (1.0, 0.63, 0.32)
    if ph in _DIPHTHONG_F:
        a, b = _DIPHTHONG_F[ph]
        return ("vowel", tuple(x * det for x in a),
                tuple(x * det for x in b), None, (1.0, 0.63, 0.32))
    if ph in _CONS:
        cls, loci, noise = _CONS[ph]
        f = tuple(x * det for x in loci)
        gains = {"nasal": (1.0, 0.18, 0.12), "liquid": (1.0, 0.5, 0.3),
                 "glide": (1.0, 0.6, 0.3)}.get(cls, (0.7, 0.5, 0.3))
        return cls, f, f, noise, gains
    return "vowel", _SCHWA_F, _SCHWA_F, None, (0.8, 0.5, 0.3)


def _render_utterance_v3(phonemes, dur_s: float, sample_rate: int,
                         f0_shift: float, rng) -> "np.ndarray":
    """Formant-synthesize one utterance: dense harmonics under moving
    formant envelopes + band-shaped noise, uniform phoneme duration."""
    import zlib

    import numpy as np

    ctrl_hz = 200.0                       # control-track rate
    n_ph = len(phonemes)
    frames_per_ph = max(int(round(dur_s * ctrl_hz)), 4)
    n_ctrl = n_ph * frames_per_ph
    n_samples = int(n_ph * dur_s * sample_rate)

    # --- per-control-frame targets (piecewise within phonemes) ----------
    F = np.zeros((n_ctrl, 3))             # formant centre tracks
    G = np.zeros((n_ctrl, 3))             # per-formant gains
    voic = np.zeros(n_ctrl)               # harmonic mix
    fric = np.zeros(n_ctrl)               # fricative-noise mix
    nc = np.full(n_ctrl, 3000.0)          # noise centre
    nw = np.full(n_ctrl, 2500.0)          # noise width
    amp = np.zeros(n_ctrl)                # overall amplitude
    acc = np.zeros(n_ctrl)                # F0 accent
    for i, ph in enumerate(phonemes):
        h = zlib.crc32(ph.encode())
        cls, fa, fb, noise, gains = _phoneme_targets(ph, h)
        s, e = i * frames_per_ph, (i + 1) * frames_per_ph
        w = np.linspace(0.0, 1.0, frames_per_ph)
        for j in range(3):
            F[s:e, j] = fa[j] + (fb[j] - fa[j]) * w
            G[s:e, j] = gains[j]
        if noise is not None:
            nc[s:e], nw[s:e] = noise
        # class-keyed voicing / noise / amplitude programs
        if cls == "vowel":
            voic[s:e], amp[s:e] = 1.0, 1.0
            fric[s:e] = 0.0
        elif cls in ("nasal", "liquid", "glide"):
            voic[s:e], amp[s:e] = 1.0, 0.75
        elif cls == "vfric":
            voic[s:e], fric[s:e], amp[s:e] = 0.6, 0.5, 0.65
        elif cls == "ufric":
            voic[s:e], fric[s:e], amp[s:e] = 0.0, 1.0, 0.55
        elif cls == "asp":
            voic[s:e], fric[s:e], amp[s:e] = 0.2, 0.8, 0.5
        elif cls in ("vstop", "ustop", "affr"):
            # closure (low, voiced bar if voiced) then burst + decay
            k = max(frames_per_ph // 3, 1)
            voiced = cls == "vstop"
            voic[s:e] = 0.8 if voiced else 0.0
            amp[s:s + k] = 0.12            # closure, NOT full silence
            burst = np.linspace(1.0, 0.45, frames_per_ph - k)
            amp[s + k:e] = burst
            fric[s + k:e] = 1.0 if cls in ("ustop", "affr") else 0.4
            if cls == "affr":
                voic[s + k:e] = 0.3
        if ph == "SP":                    # coarticulated schwa bridge
            voic[s:e], amp[s:e], fric[s:e] = 0.9, 0.55, 0.0
        acc[s:e] = 1.0 + ((h % 9) - 4) * 0.03   # phoneme-keyed accent

    # --- coarticulation: smooth every track across boundaries -----------
    def smooth(x, sigma_s):
        k = int(sigma_s * ctrl_hz * 3) * 2 + 1
        t = (np.arange(k) - k // 2) / (sigma_s * ctrl_hz)
        g = np.exp(-0.5 * t * t)
        g /= g.sum()
        if x.ndim == 1:
            return np.convolve(np.pad(x, (k // 2,), mode="edge"), g, "valid")
        return np.stack([smooth(x[:, j], sigma_s)
                         for j in range(x.shape[1])], 1)

    F = smooth(F, 0.020)                  # ~40 ms formant transitions
    G = smooth(G, 0.015)
    voic = smooth(voic, 0.008)
    fric = smooth(fric, 0.008)
    nc = smooth(nc, 0.015)
    nw = smooth(nw, 0.015)
    amp = smooth(amp, 0.010)
    acc = smooth(acc, 0.040)

    # --- F0 contour: base × speaker shift × declination × accents -------
    t_ctrl = np.arange(n_ctrl) / ctrl_hz
    decl = np.linspace(1.08, 0.90, n_ctrl)
    f0 = 108.0 * f0_shift * decl * acc

    # --- spectral envelope evaluated on the control grid -----------------
    bw = np.array([130.0, 180.0, 240.0])  # formant bandwidths (Hz)

    def envelope(freqs, idx=slice(None)):
        """E(f, t) for freqs [K] on control frames idx → [T, K]."""
        f = np.asarray(freqs)[None, None, :]            # [1,1,K]
        cf = F[idx][:, :, None]                          # [T,3,1]
        g = G[idx][:, :, None]
        r = (g * np.exp(-0.5 * ((f - cf) / bw[None, :, None]) ** 2)).sum(1)
        tilt = 1.0 / (1.0 + (np.asarray(freqs)[None, :] / 3200.0) ** 2)
        return (r + 0.035) * tilt                        # floor: no dead bands

    # --- harmonic part ---------------------------------------------------
    K = 48
    ks = np.arange(1, K + 1)
    # per-harmonic amplitude on the control grid: E(k·f0(t), t)
    fk = f0[:, None] * ks[None, :]                       # [T, K]
    cf = F[:, :, None]
    gf = G[:, :, None]
    rk = (gf * np.exp(-0.5 * ((fk[:, None, :] - cf) / bw[None, :, None]) ** 2)).sum(1)
    ak = (rk + 0.035) / (1.0 + (fk / 3200.0) ** 2)
    ak *= (fk < 8500.0)
    ak *= voic[:, None]

    # upsample control tracks to audio rate
    t_audio = np.arange(n_samples) / sample_rate
    f0_a = np.interp(t_audio, t_ctrl, f0)
    phase = 2.0 * np.pi * np.cumsum(f0_a) / sample_rate
    harm = np.zeros(n_samples)
    phases = (zlib.crc32(b"phase") >> np.arange(K)) % 7  # fixed dispersion
    for k in range(K):
        a = np.interp(t_audio, t_ctrl, ak[:, k])
        if a.max() < 1e-4:
            continue
        harm += a * np.sin((k + 1) * phase + phases[k])

    # --- noise part: fixed log-spaced bands, time-varying mix ------------
    n_bands = 14
    edges = np.geomspace(120.0, 9500.0, n_bands + 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    white = rng.standard_normal(n_samples)
    spec = np.fft.rfft(white)
    fgrid = np.fft.rfftfreq(n_samples, 1.0 / sample_rate)
    band_sig = np.empty((n_bands, n_samples))
    for b in range(n_bands):
        m = (fgrid >= edges[b]) & (fgrid < edges[b + 1])
        band_sig[b] = np.fft.irfft(spec * m, n_samples)
        band_sig[b] /= np.sqrt(np.mean(band_sig[b] ** 2) + 1e-9)
    # fricative spectrum: Gaussian bump at nc(t); breath: formant envelope
    fric_gain = np.exp(-0.5 * ((centers[None, :] - nc[:, None])
                               / nw[:, None]) ** 2)     # [T, B]
    breath_gain = envelope(centers) * 0.10               # audible breathiness
    noise_ctrl = fric[:, None] * fric_gain * 0.6 + breath_gain
    noise = np.zeros(n_samples)
    for b in range(n_bands):
        noise += np.interp(t_audio, t_ctrl, noise_ctrl[:, b]) * band_sig[b]

    amp_a = np.interp(t_audio, t_ctrl, amp)
    sig = amp_a * (harm + noise)
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
    if profile not in ("v1", "v2", "v3"):
        raise ValueError(f"unknown synthetic profile {profile!r}")
    # v3 (default): formant-synthesized speech-like corpus (see the v3
    # block above) — white-noise STOI floor measured < 0.4, per-band
    # envelopes keyed to phoneme identity via moving formants.
    # v2: envelope-diverse octave partials (r4 drives; utterance floor
    # ~0.53 via empty-band SDR clipping). v1: r2/r3 compat (floor 0.70).
    signal_fn = _phoneme_signal_v2 if profile == "v2" else _phoneme_signal
    corpus = data_dir / (f"synthetic-{n}" if profile == "v1"
                         else f"synthetic-{profile}-{n}")
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
        if profile == "v3":
            # render exactly the `length`-counted content slots (drop the
            # edge SILs) at a uniform per-utterance duration: the
            # uniform-duration alignment quirk then holds exactly, up to
            # a constant one-slot shift (see the v3 design block above)
            content = [p for p in phonemes if p != "SIL"]
            f0_shift = float(rng.uniform(0.8, 1.3))
            dur_s = 0.10 * rate
            audio = _render_utterance_v3(content, dur_s, sample_rate,
                                         f0_shift, rng)
        else:
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
    p.add_argument("--synthetic-profile", default="v3",
                   choices=("v1", "v2", "v3"),
                   help="synthetic corpus signal profile (v3: formant-"
                        "synthesized speech-like, STOI floor <0.4; v2: "
                        "envelope-diverse r4 compat; v1: r2/r3 compat)")
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
