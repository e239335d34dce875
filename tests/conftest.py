"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere.
"""

import os
import sys

# Default: CPU with 8 virtual devices (fast compiles, multi-device sharding
# tests). Set SEA_TEST_PLATFORM=axon to run the same suite on a real TPU --
# the integer kernels are bit-exact on both backends and the full round-trip
# suite has been validated on TPU hardware.
#
# Note: the environment may pre-register a TPU PJRT plugin at interpreter
# startup (sitecustomize) and select it programmatically, which overrides the
# JAX_PLATFORMS env var -- so the platform must be forced via jax.config.
_platform = os.environ.get("SEA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache for the suite: hundreds of tiny XLA programs
# dominate wall-clock on a cold run; caching them across runs (and xdist
# workers -- the cache is concurrent-safe) cuts repeat runs substantially.
# Separate directory from the shipped TPU .jax_cache so bench's
# cache_new_entries accounting never sees CPU test entries. SEA_TEST_CACHE=0
# disables.
_cache = os.environ.get("SEA_TEST_CACHE", "1")
if _cache != "0":
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_test_cache"
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# Suite-scale mitigation: periodically drop JAX's in-process executable caches.
#
# The full single-process suite compiles hundreds of distinct XLA CPU
# executables; under jax/jaxlib 0.9.0 the process RSS grows ~1 GB -> ~8 GB
# across the run and reliably segfaults (rc=139) deep inside
# jaxlib's executable deserialize/compile path around the ~557th test
# (tests/test_roundtrip.py::test_parameters) -- reproduced 3/3 with and
# without the persistent test cache, never reproduced by any <=280-test
# subset. Root cause (upstream-isolated by scripts/repro_jaxlib_segfault.py
# with zero project code): XLA:CPU's LLVM execution engine exhausts a
# bounded allocation as live executables accumulate ("LLVM compilation
# error: Cannot allocate memory", then segfault -- NOT system OOM).
# Dropping the jit/pjit executable caches every N tests (plus a GC pass)
# bounds the accumulated native state (committed profiles:
# docs/rss_profile_{mitigated,unmitigated}_r05.txt); recompiles after a
# clear are serviced from the on-disk persistent cache, so the wall-clock
# cost is small. SEA_TEST_CLEAR_EVERY=0 disables (restores the crashing
# behavior, useful for reproducing the underlying jaxlib issue).
# ---------------------------------------------------------------------------
_CLEAR_EVERY = int(os.environ.get("SEA_TEST_CLEAR_EVERY", "60"))
# SEA_TEST_RSS: "0" (off, default), "1" (stderr -- note pytest captures
# teardown stderr, so this only shows with -s), or a file path (appended,
# survives capture; used for the committed RSS profile)
_RSS_LOG = os.environ.get("SEA_TEST_RSS", "0")
_test_count = 0


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except Exception:
        return float("nan")


def _rss_report(when: str) -> None:
    if _RSS_LOG == "0":
        return
    line = f"[conftest] test {_test_count} {when}: rss={_rss_gb():.2f} GB\n"
    if _RSS_LOG == "1":
        sys.stderr.write("\n" + line)
    else:
        with open(_RSS_LOG, "a") as f:
            f.write(line)


def pytest_runtest_teardown(item, nextitem):
    global _test_count
    _test_count += 1
    if _CLEAR_EVERY and _test_count % _CLEAR_EVERY == 0:
        _rss_report("pre-clear")
        import gc

        jax.clear_caches()
        gc.collect()
        _rss_report("post-clear")
    elif not _CLEAR_EVERY and _test_count % 60 == 0:
        # mitigation disabled (repro mode): still profile RSS growth
        _rss_report("no-clear")


def pallas_interpret() -> bool:
    """Interpret-mode flag for the Pallas kernel tests: on CPU the kernels
    run under the interpreter (no Mosaic); on a real TPU
    (``SEA_TEST_PLATFORM=axon``) the SAME tests exercise the compiled
    kernels, which is the committed evidence that the compiled path is
    bit-exact (not just the bench-time spot assertions)."""
    return _platform == "cpu"
