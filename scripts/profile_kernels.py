"""Capture committed device-trace artifacts for the two flagship kernels.

docs/PERF.md argues the decode and encode-search kernels are VPU-issue
bound against their counted op chains; this script turns that from prose
into a checkable artifact: it runs each flagship program on the real chip
under ``jax.profiler.trace``, parses the captured Chrome-trace
(device plane, "XLA Ops" thread: per-HLO ``device_duration_ps`` with HLO
category and source attribution), and

  1. copies the raw ``*.trace.json.gz`` into ``docs/profiles/`` so a
     reviewer can open the exact trace this table came from, and
  2. prints a per-op markdown table (embedded in
     ``docs/KERNEL_PROFILE_r05.md``) with each op's device time, share of
     the program, bytes accessed, and the implied samples/s of the main
     kernel op.

Programs traced (bench geometries):
  - packed CBR decode, fused single-kernel path
    (``decode_chunks_packed`` @ n=12288, fpc=5120, c=2, rs=3 -- the
    decode-headline program at a 126 Msample batch)
  - encode scale-factor search (``run_window_search`` @ 512 lanes,
    W=256, sff=20, sfb=4 -- the corpus-encode block kernel)

Run: python scripts/profile_kernels.py    (needs the TPU)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# keep profile-run programs OUT of the shipped .jax_cache
jax.config.update("jax_compilation_cache_dir", None)

from sea_codec_tpu.ops import tables  # noqa: E402
from sea_codec_tpu.ops.bitpack import packed_byte_len  # noqa: E402
from sea_codec_tpu.ops.device_decode import decode_chunks_packed  # noqa: E402
from sea_codec_tpu.ops.pallas_encode import (  # noqa: E402
    pack_state,
    prepare_n_valid,
    prepare_window_streams,
    run_window_search,
)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "profiles")


def _trace_one(tag: str, fn, n_samples: int) -> None:
    def sync():
        # fetch one element: over the relay, block_until_ready can return
        # at enqueue-ack, so a fetch is the only trustworthy sync
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    sync()  # compile + warm
    t0 = time.perf_counter()
    sync()
    wall = time.perf_counter() - t0
    logdir = f"/tmp/ktrace_{tag}"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        sync()
    src = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    os.makedirs(OUT_DIR, exist_ok=True)
    dst = os.path.join(OUT_DIR, f"{tag}.trace.json.gz")
    shutil.copy(src, dst)

    ev = json.load(gzip.open(src))["traceEvents"]
    dev_pid = {e["pid"] for e in ev
               if e.get("ph") == "M" and e.get("name") == "process_name"
               and "TPU" in e["args"].get("name", "")}
    tid_ops = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"}
    ops = [e for e in ev
           if e.get("ph") == "X" and e.get("pid") in dev_pid
           and (e["pid"], e.get("tid")) in tid_ops]
    total_us = sum(e["dur"] for e in ops)
    print(f"\n### {tag}")
    print(f"wall (warm, fetch-synced, incl. relay dispatch): "
          f"{wall * 1e3:.1f} ms; "
          f"device ops total: {total_us / 1e3:.2f} ms; "
          f"{n_samples / 1e6:.0f} Msamples "
          f"=> {n_samples / total_us / 1e3:.1f} Gsamples/s device")
    print(f"raw trace: docs/profiles/{tag}.trace.json.gz")
    print("\n| op (HLO) | category | device ms | % | MB accessed |")
    print("|---|---|---|---|---|")
    agg: dict[tuple, list[float]] = {}
    for e in ops:
        a = e.get("args", {})
        key = (e["name"], a.get("hlo_category", "?"))
        rec = agg.setdefault(key, [0.0, 0.0])
        rec[0] += e["dur"]
        rec[1] += float(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)))
    for (name, cat), (dur, byt) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        if dur / total_us < 0.002:
            continue
        print(f"| `{name}` | {cat} | {dur / 1e3:.2f} | "
              f"{dur / total_us * 100:.1f}% | {byt / 1e6:.0f} |")


def cbr_decode_program():
    rng = np.random.default_rng(0)
    n, fpc, c, rs, sff, sfb = 12288, 5120, 2, 3, 20, 4
    bw = packed_byte_len(rs, fpc * c)
    w = fpc // sff
    res = jnp.asarray(rng.integers(0, 256, (n, bw), dtype=np.uint8))
    sf = jnp.asarray(rng.integers(0, 16, (n, w, c), dtype=np.uint8))
    rsa = jnp.full((n, w, c), rs, jnp.uint8)
    hist = jnp.zeros((n, c, 4), jnp.int32)
    wts = jnp.zeros((n, c, 4), jnp.int32)
    dqt = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)

    def fn():
        return decode_chunks_packed(
            res, sf, rsa, hist, wts, dqt,
            scale_factor_frames=sff, frames=fpc, residual_size=rs,
            use_pallas=True,
        )

    return fn, n * fpc * c


def vbr_decode_program():
    rng = np.random.default_rng(2)
    n, fpc, c, sff, sfb, mcb = 12288, 5120, 2, 20, 4, 4
    w = fpc // sff
    # structurally valid VBR rows: per-window sizes 1..4, residual section
    # sized for the worst case, random bytes (decode output is garbage PCM
    # but every fetch/extract path runs exactly as in production)
    rs = rng.integers(1, mcb + 1, (n, w, c)).astype(np.uint8)
    bw = int(packed_byte_len(mcb, fpc * c))
    res = jnp.asarray(rng.integers(0, 256, (n, bw), dtype=np.uint8))
    sf = jnp.asarray(rng.integers(0, 16, (n, w, c), dtype=np.uint8))
    rsa = jnp.asarray(rs)
    hist = jnp.zeros((n, c, 4), jnp.int32)
    wts = jnp.zeros((n, c, 4), jnp.int32)
    dqt = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)

    def fn():
        return decode_chunks_packed(
            res, sf, rsa, hist, wts, dqt,
            scale_factor_frames=sff, frames=fpc, residual_size=0,
            use_pallas=True, max_code_bits=mcb,
        )

    return fn, n * fpc * c


def encode_search_program():
    sff, sfb, fpc, lanes = 20, 4, 5120, 512
    s = 1 << sfb
    w = fpc // sff
    rng = np.random.default_rng(1)
    from sea_codec_tpu.utils.signal import varied_signal

    sig = np.stack(
        [varied_signal(1, fpc, seed=int(rng.integers(1 << 30)))
         for _ in range(lanes)],
        axis=1,
    ).astype(np.int32)
    smp = jnp.asarray(sig)
    rs1 = jnp.full((w, lanes), 3, jnp.int32)
    streams, wb, wp = prepare_window_streams(rs1, sff, sfb, lanes)
    nv = prepare_n_valid(jnp.full((w, lanes), sff, jnp.int32), wp, lanes)
    hist0 = jnp.zeros((lanes, 4), jnp.int32)
    wts0 = (
        jnp.zeros((lanes, 4), jnp.int32).at[:, 2].set(-(1 << 13))
        .at[:, 3].set(1 << 14)
    )
    state0 = pack_state(hist0, wts0, jnp.zeros((lanes,), jnp.int32), s, lanes)

    @jax.jit
    def run(state, smp):
        return run_window_search(
            state, smp, nv, streams, wb, wp, sff, sfb, lanes, all_valid=True
        )

    return (lambda: run(state0, smp)), fpc * lanes


def main() -> None:
    assert jax.devices()[0].platform == "tpu", "profiling needs the TPU"
    fn, ns = cbr_decode_program()
    _trace_one("cbr_decode", fn, ns)
    fn, ns = vbr_decode_program()
    _trace_one("vbr_decode", fn, ns)
    fn, ns = encode_search_program()
    _trace_one("encode_search", fn, ns)


if __name__ == "__main__":
    main()
