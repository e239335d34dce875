"""Minimal jaxlib-0.9.0 repro attempt: executable accumulation -> segfault.

The full test suite (no sea-codec code needed -- see the A/B profiles in
docs/rss_profile_*.txt) segfaults rc=139 on this host once enough
DISTINCT compiled XLA CPU executables accumulate in one process: RSS
climbs ~1 -> ~8.8 GB and the crash lands inside jaxlib's executable
deserialize/compile path (jax/jaxlib 0.9.0). This script reproduces the
ingredient without any of this repo's code: it compiles thousands of
distinct programs (unique static constants + varying shapes, scan bodies
to give the executables realistic size), holds their caches alive the
way a test session does, and reports RSS as it goes. Phase 2 adds the
persistent compilation cache so the deserialize path (2 of the 3
observed crash sites) is exercised too.

OUTCOME on this host (2026-08-20, jax/jaxlib 0.9.0, 125 GB RAM mostly
free): **reproduced** -- rc=139 after ~3000 distinct executables
(RSS 4.28 GB), immediately preceded by
``E ... execution_engine.cc:54] LLVM compilation error: Cannot allocate
memory`` twice. The process dies on a bounded XLA:CPU JIT resource
(LLVM execution-engine allocation), NOT system memory -- no sea-codec
code anywhere in the loop. The test suite's larger executables hit the
same wall at ~550 tests; the mitigation in tests/conftest.py (drop the
executable caches every 60 tests) is what keeps the suite green.

Run: JAX_PLATFORMS=cpu python scripts/repro_jaxlib_segfault.py [N]
(expect multi-GB RSS; bound it with ulimit or a container if needed)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000


def rss_gb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e9


def make(i: int):
    k = 2 + (i % 7)

    def f(x):
        def body(c, _):
            c = c * (i % 251 + 1) + i
            c = jnp.where(c > i, c - k, c + k)
            return c, c.sum()

        out, ys = jax.lax.scan(body, x, None, length=k)
        return out + ys[-1]

    return jax.jit(f)


def main() -> None:
    keep = []  # hold every jitted fn (and so its executable) alive
    x_cache = {}
    for i in range(N):
        shape = (8 + (i % 32), 128)
        x = x_cache.setdefault(shape, jnp.ones(shape, jnp.int32))
        f = make(i)
        jax.block_until_ready(f(x))
        keep.append(f)
        if (i + 1) % 200 == 0:
            print(f"{i + 1} executables: rss={rss_gb():.2f} GB", flush=True)
    print(f"phase 1 survived: {N} distinct executables, rss={rss_gb():.2f} GB")

    cache_dir = "/tmp/repro_jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    for i in range(N, N + N // 2):
        shape = (8 + (i % 32), 128)
        x = x_cache.setdefault(shape, jnp.ones(shape, jnp.int32))
        f = make(i)
        jax.block_until_ready(f(x))
        keep.append(f)
        if (i + 1) % 200 == 0:
            print(f"{i + 1} executables (persistent cache on): "
                  f"rss={rss_gb():.2f} GB", flush=True)
    print(f"phase 2 survived: rss={rss_gb():.2f} GB -- no crash at this scale")


if __name__ == "__main__":
    main()
