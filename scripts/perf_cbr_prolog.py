"""CBR fused-decode internals: where do the ~80 ms at 1007 Msamples go?

Times (1) the XLA byte-transpose+widen feeding the fused kernel, (2) the
fused unpack+dequant kernel, (3) the recurrence, (4) the full production
decode. Relay adds ~30 ms fixed dispatch per number: compare deltas.
Usage: python scripts/perf_cbr_prolog.py [mult]
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
from sea_codec_tpu.ops.pallas_dequant import (
    LANES,
    _plan_blocks,
    decode_chunks_packed_fused,
    unpack_dequant_cbr_lanes,
)
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def timeit(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    files = [varied_signal(channels, 8 * fpc, seed=1000 + i) for i in range(16)]
    blobs = [native_encode(f, TEST_SAMPLE_RATE, channels, frames_per_chunk=fpc)
             for f in files]
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
    w = sf.shape[1]
    c = channels
    nsamp = n * fpc * c
    m, wp = _plan_blocks(w, sff, c, rs)
    npad = -(-n // LANES) * LANES
    btot = (wp // m) * ((m * sff * c * rs) // 8)
    print(f"chunks={n} samples={nsamp/1e6:.0f}M B={res_bytes.shape[1]} "
          f"btot={btot} npad={npad} m={m}", file=sys.stderr)

    # S1: byte transpose (the XLA pass feeding the kernel; uint8 plane,
    # widening happens in-register in the kernel)
    @jax.jit
    def s1(res):
        resT = jnp.zeros((btot, npad), jnp.uint8)
        breal = min(res.shape[1], btot)
        return resT.at[:breal, :n].set(res[:, :breal].T)

    rT = jax.block_until_ready(s1(res_bytes))
    t = timeit(lambda: np.asarray(s1(res_bytes)[0, 0]))
    print(f"S1 byte transpose:      {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S2: fused unpack+dequant kernel alone (on the staged transposed plane)
    from sea_codec_tpu.ops.device_decode import _dequant_window_constants

    @jax.jit
    def make_sfvalT(sf_codes):
        sfval_win, *_ = _dequant_window_constants(
            sf_codes.astype(jnp.int32), jnp.full((n, w, c), rs, jnp.int32), sfb, rs)
        sfvalT = jnp.zeros((wp, c, npad), jnp.float32)
        return sfvalT.at[:w, :, :n].set(jnp.transpose(sfval_win, (1, 2, 0)))

    sfvT = jax.block_until_ready(make_sfvalT(sf))

    def s2():
        return unpack_dequant_cbr_lanes(rT, sfvT, rs=rs, sff=sff, c=c, m=m, sfb=sfb)

    t = timeit(lambda: np.asarray(s2()[0, 0]))
    print(f"S2 fused kernel alone:  {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S3: full production fused decode
    def s3():
        return decode_chunks_packed_fused(
            res_bytes, sf, hist, wts,
            scale_factor_frames=sff, frames=fpc, residual_size=rs, sfb=sfb)

    t = timeit(lambda: np.asarray(s3()[0, 0, 0]))
    print(f"S3 full fused decode:   {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")


if __name__ == "__main__":
    main()
