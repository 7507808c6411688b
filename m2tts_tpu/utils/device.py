"""Device/system layer: TPU device info, memory tracking, host monitoring.

TPU-native counterpart of the reference device layer (reference
src/utils/device.py): ``setup_device`` → device discovery + mesh sizing,
``MemoryTracker`` → per-device HBM stats from the JAX runtime,
``ThermalMonitor`` → host-side psutil polling kept for API parity (TPU
pods manage thermals themselves; this guards shared-host CPU frontends).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import jax

logger = logging.getLogger(__name__)


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu <cli>`` actually work.

    The axon TPU plugin wins over the plain env var, so every CLI calls
    this before first device use — the same dance tests/conftest.py and
    scripts/test_pipeline.py --cpu do. No-op when the var is unset or
    the backend is already initialized."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    # Only act when the var actually asks for the host CPU. Restricting
    # jax_platforms to the accelerator plugin (e.g. the driver exporting
    # JAX_PLATFORMS=axon) would make the host "cpu" backend unavailable,
    # which breaks host-side param init (models.init_params) — and the
    # plugin is the default platform anyway, so there is nothing to do.
    if plat and "cpu" in {p.strip() for p in plat.split(",")}:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backend already up - nothing to do
            pass


def _host_fingerprint() -> str:
    """Short tag identifying this host *instance* for cache scoping.

    XLA:CPU cache entries are AOT-compiled for the *build* machine's CPU
    features, and the persistent-cache key does NOT include them — an
    entry written on one VM can SIGILL a process on a VM with a
    different feature set (observed: cpu_aot_loader feature-mismatch
    warnings after a host migration, then dead test runs). The /proc/
    cpuinfo flags line alone proved insufficient: two VMs can expose the
    same flags while LLVM detects different effective features (r04
    driver tails still showed feature +prefer-no-gather mismatches), so
    the fingerprint also includes the kernel boot id — a VM migration
    always gets a fresh cache dir, making a foreign-host cache invisible
    instead of fatal. Within one boot (one bench rerun, one drive's
    many CLIs) reuse still works, which is where the 4-30 s/bucket
    compile savings actually live."""
    import hashlib
    import platform

    src = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    src += line
                    break
    except OSError:  # pragma: no cover - non-Linux
        src += platform.processor()
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            src += f.read().strip()
    except OSError:  # pragma: no cover - non-Linux
        pass
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Point XLA's persistent compilation cache at a repo-local dir.

    Identical graphs recompile in every fresh process; over the tunneled
    TPU backend each compile costs 4-30 s per bucket (worse under
    congestion). With the cache, the resume leg / stage-2 / eval CLIs of
    a training drive skip straight to cached executables. The dir is
    scoped per host-CPU fingerprint (see ``_host_fingerprint``). Safe
    no-op if the config knob is unavailable. Called by every CLI and
    bench.py."""
    try:
        if cache_dir is None:
            import pathlib

            cache_dir = str(pathlib.Path(__file__).resolve().parents[2]
                            / ".jax_cache" / _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax / read-only fs
        pass


from contextlib import contextmanager


@contextmanager
def no_persistent_cache():
    """Temporarily disable the persistent compile cache.

    XLA:CPU AOT cache entries are provably useless on this stack: the
    compiler bakes tuning preferences (+prefer-no-gather/scatter) into
    the entry's target-feature list, the loader's host-feature check
    never reports them, and the entry is rejected and recompiled on
    EVERY load — including on the machine that wrote it (the
    cpu_aot_loader error spam in r04/r05 driver tails). Host-CPU-side
    compiles (param init) wrap themselves in this so the cache holds
    mostly accelerator executables, which do round-trip. Best-effort:
    under the axon plugin the CPU backend's cache writes have been
    observed to bypass the flag, so some entries (and their benign
    load-error spam) can persist — the write path is upstream; the
    cross-VM SIGILL hazard is separately closed by the boot-scoped
    cache dir (_host_fingerprint)."""
    try:
        prev = jax.config.jax_enable_compilation_cache
    except AttributeError:  # pragma: no cover - older jax
        yield
        return
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)


def setup_devices(platform: Optional[str] = None) -> List[jax.Device]:
    """Return the devices to run on (TPU when present, else CPU)."""
    devices = jax.devices(platform) if platform else jax.devices()
    logger.info("Using %d %s device(s)", len(devices), devices[0].platform)
    return devices


def get_device_info() -> Dict[str, Any]:
    """Host + accelerator inventory (reference src/utils/device.py:39-61)."""
    info: Dict[str, Any] = {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "devices": [str(d) for d in jax.devices()],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    try:
        import psutil

        vm = psutil.virtual_memory()
        info["host_memory_total_gb"] = vm.total / 1e9
        info["host_memory_available_gb"] = vm.available / 1e9
        info["host_cpu_count"] = psutil.cpu_count()
    except ImportError:
        pass
    return info


def _live_bytes_per_device() -> Dict[Any, int]:
    """Fallback HBM gauge: bytes of live ``jax.Array`` shards per device.

    Counts only this process's arrays (not XLA scratch/fragmentation),
    so it is a lower bound — but it tracks the dominant consumers
    (params, optimizer state, the HBM data cache) on runtimes whose
    ``memory_stats()`` comes back empty (the tunneled axon backend).
    Metadata only: no device sync or transfer."""
    out: Dict[Any, int] = {}
    try:
        for arr in jax.live_arrays():
            try:
                for sh in arr.addressable_shards:
                    out[sh.device] = out.get(sh.device, 0) + int(sh.data.nbytes)
            except Exception:
                pass
    except Exception:
        pass
    return out


def hbm_usage() -> List[Dict[str, float]]:
    """Per-device HBM usage in GB (empty on backends without stats)."""
    usage = []
    fallback: Optional[Dict[Any, int]] = None
    for d in jax.local_devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            if raw:
                stats = {
                    "bytes_in_use_gb": raw.get("bytes_in_use", 0) / 1e9,
                    "bytes_limit_gb": raw.get("bytes_limit", 0) / 1e9,
                    "peak_bytes_gb": raw.get("peak_bytes_in_use", 0) / 1e9,
                }
            else:
                if fallback is None:
                    fallback = _live_bytes_per_device()
                stats = {
                    "bytes_in_use_gb": fallback.get(d, 0) / 1e9,
                    "live_array_lower_bound": 1.0,
                }
        except Exception:
            pass
        usage.append(stats)
    return usage


class MemoryTracker:
    """Current/peak memory gauges for metric logs (reference device.py:152)."""

    def __init__(self):
        self.peak_hbm_gb = 0.0

    def update(self) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        hbm = hbm_usage()
        if hbm and hbm[0]:
            current = hbm[0].get("bytes_in_use_gb", 0.0)
            self.peak_hbm_gb = max(self.peak_hbm_gb, current)
            metrics["hbm_gb"] = current
            metrics["hbm_peak_gb"] = max(self.peak_hbm_gb,
                                         hbm[0].get("peak_bytes_gb", 0.0))
        try:
            import psutil

            metrics["host_rss_gb"] = psutil.Process().memory_info().rss / 1e9
        except ImportError:
            pass
        return metrics


class ThermalMonitor:
    """Host thermal guard (reference device.py:64-139). TPUs self-throttle;
    this protects colocated CPU frontends and is a no-op when psutil has no
    temperature sensors."""

    def __init__(self, threshold_c: float = 80.0, check_interval_s: float = 30.0):
        self.threshold_c = threshold_c
        self.check_interval_s = check_interval_s
        self._last_check = 0.0
        self._last_ok = True

    def current_temperature(self) -> Optional[float]:
        try:
            import psutil

            temps = psutil.sensors_temperatures()
        except (ImportError, AttributeError):
            return None
        readings = [t.current for entries in temps.values() for t in entries
                    if t.current is not None]
        return max(readings) if readings else None

    def check(self) -> bool:
        """True when safe to proceed. Rate-limited to check_interval_s."""
        now = time.monotonic()
        if now - self._last_check < self.check_interval_s:
            return self._last_ok
        self._last_check = now
        temp = self.current_temperature()
        self._last_ok = temp is None or temp < self.threshold_c
        if not self._last_ok:
            logger.warning("Host temperature %.1f°C >= %.1f°C", temp,
                           self.threshold_c)
        return self._last_ok

    def wait_for_cooldown(self, max_wait_s: float = 300.0,
                          poll_s: float = 10.0) -> None:
        start = time.monotonic()
        while time.monotonic() - start < max_wait_s:
            temp = self.current_temperature()
            if temp is None or temp < self.threshold_c:
                return
            time.sleep(poll_s)


def clear_caches() -> None:
    """Drop JAX compilation caches (reference clear_cache, device.py:142)."""
    jax.clear_caches()
