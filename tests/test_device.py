"""Device-layer utilities: host-scoped persistent compile cache."""

import jax

from m2tts_tpu.utils.device import (_host_fingerprint,
                                    enable_persistent_compile_cache)


def test_host_fingerprint_stable_and_short():
    fp = _host_fingerprint()
    assert fp == _host_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)


def test_compile_cache_dir_is_host_scoped(tmp_path):
    """XLA:CPU persistent-cache entries are AOT-compiled for the writing
    host's CPU features and can SIGILL a different host; the cache dir
    must therefore be scoped by the host fingerprint."""
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_persistent_compile_cache()
        got = jax.config.jax_compilation_cache_dir
        assert got.endswith(_host_fingerprint())
        assert ".jax_cache" in got
        # explicit dir wins unscoped (caller controls the layout)
        enable_persistent_compile_cache(str(tmp_path / "c"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
