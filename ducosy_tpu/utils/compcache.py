"""Persistent XLA compilation cache.

The production programs here compile slowly (the batch-8 512^2 train step
took 3m53s to compile in the round-3 multichip dryrun; the patient
inference pipeline ~30 s), and the reference workflow restarts processes
often: per-range training runs (train.py:16-38), one generate.py process
per inference batch, every pod worker at scale. Enabling JAX's persistent
compilation cache makes every restart after the first reuse the compiled
executables from disk.

Call enable_persistent_cache() early in every CLI entry point. It is safe
before or after `import jax` (uses jax.config, not env vars) and safe to
call repeatedly. Override the location with DUCOSY_XLA_CACHE_DIR;
disable with DUCOSY_XLA_CACHE_DIR=off.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/ducosy_tpu_xla"


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache; returns the
    directory used (None when disabled).

    By default the cache is only enabled on accelerator backends: some
    jaxlib builds segfault in compilation_cache.put_executable_and_time
    while serializing certain CPU executables (see tests/conftest.py), and
    CPU programs compile fast enough not to need it. An explicit
    DUCOSY_XLA_CACHE_DIR (or cache_dir argument) overrides the gate for
    users who know their jaxlib is good.
    """
    explicit = cache_dir or os.environ.get("DUCOSY_XLA_CACHE_DIR")
    cache_dir = explicit or DEFAULT_DIR
    if cache_dir.lower() in ("off", "none", "0", ""):
        return None
    if not explicit:
        import jax

        if jax.default_backend() == "cpu":
            return None
    cache_dir = os.path.expanduser(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time; tiny programs
    # are cheaper to recompile than to hash+read
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return cache_dir
