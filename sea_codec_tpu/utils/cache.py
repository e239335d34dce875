"""Persistent XLA compilation cache.

The encoder's fused whole-file program (Pallas window kernel inside a chunk
scan) takes minutes to compile on a TPU backend; the decode/corpus programs
add more. Enabling JAX's persistent compilation cache makes every rerun of
the CLI / bench / tests start from warm binaries instead of recompiling.

Cache directory resolution, in order:

1. ``SEA_JAX_CACHE=<dir>`` -- explicit override (``0`` disables).
2. A repo-local ``.jax_cache`` directory next to the package, if present --
   the repo ships one pre-populated with the bench/CLI TPU programs so a
   fresh host's first run starts warm. Used only when the ACTUAL default
   backend is a TPU (detected via ``jax.devices()``, not just the
   ``JAX_PLATFORMS`` env var), so CPU entries from CPU-only hosts don't
   pollute the shipped cache.
3. ``~/.cache/sea_codec_tpu/jax``.

Opt-out with ``SEA_JAX_CACHE=0``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/sea_codec_tpu/jax")
_REPO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)
_enabled: str | None = None
_resolved: list = []  # memoized cache_dir() result (may be None)


def cache_dir() -> str | None:
    """The directory ``enable_compilation_cache`` will use (or used), or
    None when caching is disabled. Memoized: the backend probe inside
    ``_tpu_backend`` initializes the default backend, which is expensive
    (and blocks on a down TPU relay tunnel) -- it must run at most once."""
    if _enabled is not None:
        return _enabled
    if _resolved:
        return _resolved[0]
    setting = os.environ.get("SEA_JAX_CACHE", "")
    if setting == "0":
        out = None
    elif setting not in ("", "1"):
        out = setting
    elif os.path.isdir(_REPO_DIR) and _tpu_backend():
        out = _REPO_DIR
    else:
        out = _DEFAULT_DIR
    _resolved.append(out)
    return out


def _tpu_backend() -> bool:
    """True iff jax's default backend is a TPU. The env-var check alone is
    not enough: a CPU-only host with JAX_PLATFORMS unset would otherwise
    write CPU binaries into the shipped TPU cache."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return False
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def cache_entries() -> int:
    """Number of entries currently in the cache directory (0 if absent)."""
    d = cache_dir()
    try:
        return len([f for f in os.listdir(d) if f.endswith("-cache")]) if d else 0
    except OSError:
        return 0


def enable_compilation_cache() -> bool:
    """Idempotently enable the persistent compilation cache. Returns whether
    the cache is active."""
    global _enabled
    if _enabled is not None:
        return True
    target = cache_dir()
    if target is None:
        return False
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
    except Exception:
        return False
    # The cache is active from here on; the remaining knobs are
    # version-dependent tuning and must not un-enable it (nor leave
    # ``_enabled`` unset while the cache dir is already configured).
    _enabled = target
    for flag, val in (
        # cache everything, however small or fast to compile
        ("jax_persistent_cache_min_entry_size_bytes", -1),
        ("jax_persistent_cache_min_compile_time_secs", 0.0),
        # Mosaic kernels serialize their MLIR locations into the program,
        # and with full tracebacks those locations include the CALLER's
        # file:line stack -- so the same decode program called from
        # bench.py vs a script got different cache keys, and any edit to a
        # caller invalidated the shipped cache. Keep locations limited to
        # the kernel's own source so keys depend only on kernel files.
        ("jax_include_full_tracebacks_in_locations", False),
    ):
        try:
            jax.config.update(flag, val)
        except Exception:  # jax version without this knob
            pass
    return True
