"""Diagnose headline first-touch variance: cache load vs first execution.

The bench's headline decode program showed 84 s / 298 s / 576 s first-touch
times across runs that all reported "+0 entries" afterwards. This script
separates the phases:

  1. enable the persistent cache with miss-explanations + debug logging,
  2. build the EXACT headline program args (128 diverse native-encoded
     chunks tiled x768 on device),
  3. time AOT ``.lower()`` (trace) and ``.compile()`` (cache lookup or
     remote compile) separately,
  4. time the first execution and steady-state reps.

Run it several times to sample the variance; stderr carries jax's own
cache hit/miss lines.
"""

from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

logging.basicConfig(level=logging.DEBUG, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")
for noisy in ("jax._src.dispatch", "jax._src.interpreters", "urllib3",
              "jax._src.xla_bridge"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

from sea_codec_tpu.utils.cache import cache_entries, enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

jax.config.update("jax_explain_cache_misses", True)

from sea_codec_tpu.batch import parsed_concat
from sea_codec_tpu.native.binding import native_encode
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_decode import (
    _decode_chunks_packed_jit,
    default_use_pallas,
)
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    t_all = time.perf_counter()
    channels, fpc = 2, 5120
    use_pallas = default_use_pallas()
    n0 = cache_entries()
    log(f"cache entries: {n0}; device {jax.devices()[0]}")

    files = [varied_signal(channels, 8 * fpc, seed=1000 + i) for i in range(16)]
    blobs = [native_encode(f, TEST_SAMPLE_RATE, channels, frames_per_chunk=fpc)
             for f in files]
    _header, cfg, cat = parsed_concat(blobs)  # same geometry as bench.py
    dqt_flat = jnp.asarray(
        tables.dqt_stacked(cfg.scale_factor_bits).reshape(-1), jnp.int32)
    mult = 768
    t0 = time.perf_counter()
    args = tuple(
        jax.block_until_ready(
            jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(
                jnp.asarray(a)))
        for a in cat
    )
    log(f"[tile {time.perf_counter() - t0:.1f}s]")

    kw = dict(
        scale_factor_frames=cfg.scale_factor_frames,
        frames=fpc,
        residual_size=cfg.residual_size,
        use_pallas=use_pallas,
        # mirror the public decode_chunks_packed wrapper's kill-switch so
        # this diagnoses the SAME program the bench headline runs
        fused=os.environ.get("SEA_FUSED_PROLOG") != "0",
    )

    t0 = time.perf_counter()
    lowered = _decode_chunks_packed_jit.lower(*args, dqt_flat, **kw)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args, dqt_flat)
    np.asarray(out[0, 0, 0])
    t_exec1 = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = compiled(*args, dqt_flat)
        np.asarray(out[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    n1 = cache_entries()
    log(f"PHASES lower={t_lower:.1f}s compile={t_compile:.1f}s "
        f"exec1={t_exec1:.1f}s steady={min(ts) * 1e3:.1f}ms "
        f"entries {n0}->{n1} total={time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
