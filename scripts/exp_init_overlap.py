"""Experiment: can XLA-only device work overlap the first-Mosaic-load init?

bench.py's budget killer is the "first Mosaic load roulette": the first
Pallas/Mosaic program a process loads+runs pays a server-side init that
tracks remote load (0.5-3 s idle, 478 s observed under load on
2026-08-18). If plain-XLA programs can execute at full speed on another
thread WHILE that init is in flight, the bench can restructure: fire the
Mosaic absorber on a side thread and run the tunnel-bound XLA-only stages
(corpus e2e encode/decode, corpus1000) under it, reclaiming up to ~130 s
of budget.

Protocol (device required):
  1. time the first-ever XLA execute (does generic device init cost?)
  2. baseline: N reps of a ~10 ms XLA workload
  3. start thread A: compile+load+run a trivial Pallas kernel (pays the
     Mosaic roulette); record its wall time
  4. main thread: loop the XLA workload while A runs, recording latencies
  5. report XLA latency during-A vs after-A

Interpretation: during-A ~= after-A  -> overlap works, restructure bench.
               during-A >> after-A or errors -> init blocks the device.

Run: python scripts/exp_init_overlap.py
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401
import jax
import jax.numpy as jnp

from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main() -> None:
    t0 = time.perf_counter()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({time.perf_counter() - t0:.1f}s to list)")

    # 1. first XLA contact
    t0 = time.perf_counter()
    jnp.asarray(1, jnp.int32).block_until_ready()
    print(f"first tiny transfer+execute: {time.perf_counter() - t0:.2f}s")

    x = jnp.ones((4096, 4096), jnp.float32)

    @jax.jit
    def xla_work(v):
        for _ in range(8):
            v = v @ v * jnp.float32(1e-9) + jnp.float32(0.5)
        return v.sum()

    # NOTE (2026-08-18 run): under the axon relay, block_until_ready()
    # returned in ~0.03 ms for a ~20 ms matmul chain -- readiness appears
    # to mean "enqueued", not "executed". Force a scalar FETCH to actually
    # synchronize; latency numbers therefore include one tunnel round-trip.
    t0 = time.perf_counter()
    float(xla_work(x))
    print(f"xla_work compile+first run: {time.perf_counter() - t0:.2f}s")
    base = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(xla_work(x))
        base.append(time.perf_counter() - t0)
    print(f"xla_work baseline: min {min(base) * 1e3:.1f} ms "
          f"med {sorted(base)[5] * 1e3:.1f} ms")

    # 3. Mosaic trigger on a side thread
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    def copy_kernel(src, dst):
        dst[:] = src[:] + jnp.int32(1)

    def mosaic_prog(v):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        )(v)

    mosaic_done = threading.Event()
    mosaic_wall = [None]

    def run_mosaic():
        tm = time.perf_counter()
        try:
            out = jax.jit(mosaic_prog)(jnp.zeros((8, 128), jnp.int32))
            out.block_until_ready()
            mosaic_wall[0] = time.perf_counter() - tm
        except Exception as e:  # noqa: BLE001
            mosaic_wall[0] = f"FAILED {e!r}"
        finally:
            mosaic_done.set()

    th = threading.Thread(target=run_mosaic, daemon=True)
    start = time.perf_counter()
    th.start()

    during, after = [], []
    while not mosaic_done.is_set() and time.perf_counter() - start < 580:
        t0 = time.perf_counter()
        float(xla_work(x))
        during.append(time.perf_counter() - t0)
    th.join(timeout=600)
    for _ in range(10):
        t0 = time.perf_counter()
        float(xla_work(x))
        after.append(time.perf_counter() - t0)

    print(f"mosaic first-load wall: {mosaic_wall[0]}")
    if during:
        d = sorted(during)
        print(f"xla during mosaic init: n={len(during)} "
              f"min {d[0] * 1e3:.1f} ms med {d[len(d) // 2] * 1e3:.1f} ms "
              f"max {d[-1] * 1e3:.1f} ms")
    a = sorted(after)
    print(f"xla after: min {a[0] * 1e3:.1f} ms med {a[len(a) // 2] * 1e3:.1f} ms")
    if during:
        ratio = (sorted(during)[len(during) // 2]) / (a[len(a) // 2])
        verdict = "OVERLAPS (restructure bench)" if ratio < 3 else "BLOCKS"
        print(f"verdict: during/after med ratio {ratio:.1f}x -> {verdict}")


if __name__ == "__main__":
    main()
