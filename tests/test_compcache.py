"""utils/compcache: the off switch and the directory plumbing.

The off switch is load-bearing: tests/conftest.py relies on
DUCOSY_XLA_CACHE_DIR=off to keep cache WRITES out of the pytest process
(this jaxlib segfaults in compilation_cache.put_executable_and_time on
some CPU executables — see conftest)."""
import os

import jax

from ducosy_tpu.utils.compcache import enable_persistent_cache


def test_off_switch_disables(monkeypatch):
    monkeypatch.setenv("DUCOSY_XLA_CACHE_DIR", "off")
    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_dir_wins_and_is_created(tmp_path, monkeypatch):
    monkeypatch.setenv("DUCOSY_XLA_CACHE_DIR", "off")  # arg beats env
    target = tmp_path / "xla_cache"
    try:
        got = enable_persistent_cache(str(target))
        assert got == str(target)
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2
    finally:
        # restore the suite's no-cache invariant whatever happens above
        jax.config.update("jax_compilation_cache_dir", None)


def test_conftest_keeps_cache_off_in_suite():
    """The invariant the segfault fix rests on."""
    assert os.environ.get("DUCOSY_XLA_CACHE_DIR") == "off"
    assert jax.config.jax_compilation_cache_dir in (None, "")
