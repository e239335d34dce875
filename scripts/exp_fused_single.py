"""A/B: single-kernel fused CBR decode vs the two-kernel fused path.

Hypothesis: eliding the int16 dq HBM round trip between the prolog and
recurrence kernels (~4 GB/Gsample) saves ~5-7 ms of the ~51 ms device
decode. Usage: python scripts/exp_fused_single.py [mult]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from sea_codec_tpu.batch import parse_full_chunks, split_chunks
from sea_codec_tpu.native.binding import native_encode
from sea_codec_tpu.ops.pallas_dequant import decode_chunks_packed_fused
from sea_codec_tpu.ops.pallas_fused_decode import decode_chunks_packed_fused_single
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def timeit(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def stream(fn, k=4, rounds=3):
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        np.asarray(r[0, 0, 0])
        t = (time.perf_counter() - t0) / k
        best = t if best is None or t < best else best
    return best


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    files = [varied_signal(channels, 8 * fpc, seed=1000 + i) for i in range(16)]
    blobs = [native_encode(f, TEST_SAMPLE_RATE, channels, frames_per_chunk=fpc)
             for f in blobs_src(files)]
    fields = []
    header = None
    for enc in blobs:
        h, rect, _ = split_chunks(enc)
        b = parse_full_chunks(rect, h)
        header = header or h
        fields.append((b.res_bytes, b.sf, b.hist, b.wts, b))
    parts = list(zip(*fields))
    cat = [np.concatenate(p, axis=0) for p in parts[:4]]
    cfg = parts[4][0]
    sff, sfb, rs = cfg.scale_factor_frames, cfg.scale_factor_bits, cfg.residual_size
    tile = lambda a: jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a)))
    res_bytes, sf, hist, wts = (tile(a) for a in cat)
    n = res_bytes.shape[0]
    nsamp = n * fpc * channels
    print(f"chunks={n} samples={nsamp/1e6:.0f}M", file=sys.stderr)

    def two_kernel():
        return decode_chunks_packed_fused(
            res_bytes, sf, hist, wts,
            scale_factor_frames=sff, frames=fpc, residual_size=rs, sfb=sfb)

    def one_kernel():
        return decode_chunks_packed_fused_single(
            res_bytes, sf, hist, wts,
            scale_factor_frames=sff, frames=fpc, residual_size=rs, sfb=sfb)

    # correctness first, on a slice-compare of the full outputs
    a = np.asarray(two_kernel()[:64])
    barr = np.asarray(one_kernel()[:64])
    assert np.array_equal(a, barr), "single-kernel output != two-kernel output"
    print("bit-identical on 64-chunk prefix", file=sys.stderr)

    t2 = timeit(lambda: np.asarray(two_kernel()[0, 0, 0]))
    print(f"two-kernel fused:    {t2*1e3:7.1f} ms  {nsamp/t2/1e9:6.2f} Gsps",
          file=sys.stderr)
    t1 = timeit(lambda: np.asarray(one_kernel()[0, 0, 0]))
    print(f"single-kernel fused: {t1*1e3:7.1f} ms  {nsamp/t1/1e9:6.2f} Gsps",
          file=sys.stderr)
    s2 = stream(two_kernel)
    print(f"two-kernel sustained:    {s2*1e3:7.1f} ms  {nsamp/s2/1e9:6.2f} Gsps",
          file=sys.stderr)
    s1 = stream(one_kernel)
    print(f"single-kernel sustained: {s1*1e3:7.1f} ms  {nsamp/s1/1e9:6.2f} Gsps",
          file=sys.stderr)


def blobs_src(files):
    return files


if __name__ == "__main__":
    main()
