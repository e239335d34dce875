"""Persistent XLA compilation cache.

The encoder's fused whole-file program (Pallas window kernel inside a chunk
scan) takes minutes to compile on a TPU backend; the decode/corpus programs
add more. Enabling JAX's persistent compilation cache makes every rerun of
the CLI / bench / tests start from warm binaries instead of recompiling.

Opt-out with ``SEA_JAX_CACHE=0``; override the location with
``SEA_JAX_CACHE=<dir>``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/sea_codec_tpu/jax")
_enabled = False


def enable_compilation_cache() -> bool:
    """Idempotently enable the persistent compilation cache. Returns whether
    the cache is active."""
    global _enabled
    if _enabled:
        return True
    setting = os.environ.get("SEA_JAX_CACHE", "")
    if setting == "0":
        return False
    cache_dir = setting if setting not in ("", "1") else _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small or fast to compile
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
        return True
    except Exception:
        return False
