"""ctypes bindings for the native C++ mel frontend (native/mel_frontend.cpp).

The C++ path is an exact re-implementation of ``compute_mel_spectrogram``
(frontend/audio.py:223-242) for the bulk ingest hot loop (the reference
eagerly mels the whole corpus at dataset init, reference
src/data/dataset.py:168-196). ctypes releases the GIL during the call, so
``compute_mel_batch`` scales across cores with a plain thread pool — no
C++ threading, no multiprocessing pickling.

Degrades gracefully: if the shared library is absent it is built on
demand with g++ (one-time, ~2 s); if no toolchain exists, callers fall
back to the NumPy path. ``native_available()`` is the single gate.

Parity with the NumPy pipeline is asserted in
tests/test_native_frontend.py (atol 2e-5 on the normalized mel).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "mel_frontend.cpp"


def _lib_path() -> Path:
    """Host-CPU-fingerprint-scoped .so path.

    The build uses ``-march=native``, so the binary is AOT code for the
    *build* host's CPU features — the exact failure mode CLAUDE.md
    documents for the .jax_cache: rounds migrate VMs, and a foreign-host
    .so dies with an uncatchable SIGILL on first call (no Python
    exception for AudioProcessor's fallback to catch). Scoping the
    filename by the same fingerprint utils/device uses makes a
    foreign-host binary invisible instead of fatal."""
    from m2tts_tpu.utils.device import _host_fingerprint

    return _REPO / "native" / f"libmelfrontend_{_host_fingerprint()}.so"


_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build_native(force: bool = False) -> bool:
    """Compile the shared library; returns True on success."""
    lib_path = _lib_path()
    if (lib_path.exists() and not force
            # stale-source check: edits to the .cpp must trigger a rebuild
            and lib_path.stat().st_mtime >= _SRC.stat().st_mtime):
        return True
    if not _SRC.exists():
        return False
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(lib_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built native mel frontend: %s", lib_path)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native mel frontend build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not build_native():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_lib_path()))
        lib.mf_num_frames.restype = ctypes.c_int64
        lib.mf_num_frames.argtypes = [ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_int]
        lib.mf_mel.restype = ctypes.c_int
        lib.mf_mel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except OSError as e:
        logger.warning("native mel frontend load failed: %s", e)
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def compute_mel_native(audio: np.ndarray, sample_rate: int = 22050,
                       n_fft: int = 1024, hop_length: int = 256,
                       win_length: int = 1024, n_mels: int = 64,
                       fmin: float = 0.0, fmax: Optional[float] = None
                       ) -> np.ndarray:
    """Audio → normalized log-mel [n_mels, n_frames]; see frontend.audio."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native mel frontend unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    n = audio.shape[0]
    n_frames = int(lib.mf_num_frames(n, n_fft, hop_length))
    if n_frames <= 0:
        raise ValueError(f"audio too short: {n} samples")
    out = np.empty((n_mels, n_frames), np.float32)
    rc = lib.mf_mel(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        sample_rate, n_fft, hop_length, win_length, n_mels,
        float(fmin), float(fmax if fmax is not None else 0.0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"mf_mel failed with code {rc}")
    return out


def compute_mel_batch(audios: Sequence[np.ndarray], n_threads: int = 0,
                      **kwargs) -> List[np.ndarray]:
    """Threaded bulk ingest (the GIL is released inside each C call)."""
    if n_threads <= 0:
        import os

        n_threads = min(len(audios), os.cpu_count() or 1)
    if n_threads <= 1:
        return [compute_mel_native(a, **kwargs) for a in audios]
    with ThreadPoolExecutor(n_threads) as pool:
        return list(pool.map(lambda a: compute_mel_native(a, **kwargs),
                             audios))
