"""Production-accurate VBR decode stage attribution.

Times the EXACT production pieces of the VBR device decode path
(decode_chunks_packed with residual_size=0): the one-hot matmul word
fetch, the full windowed unpack, the mixed-rs dequant, the recurrence
kernel, and the end-to-end program. Relay adds ~30 ms fixed dispatch per
number: compare deltas. Usage: python scripts/perf_vbr_attribution.py [mult]
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
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_decode import (
    _fetch_neighborhood_matmul,
    _group_frames,
    batch_max_code_bits,
    decode_chunks_packed,
    dequant_codes,
    unpack_var_windowed,
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
    files = [varied_signal(channels, 8 * fpc, seed=2000 + i) for i in range(8)]
    blobs = [
        native_encode(f, TEST_SAMPLE_RATE, channels, residual_bits=2.5,
                      frames_per_chunk=fpc, vbr=True)
        for f in files
    ]
    fields = []
    header = None
    for enc in blobs:
        h, rect, _ = split_chunks(enc)
        b = parse_full_chunks(rect, h)
        header = header or h
        fields.append((b.res_bytes, b.sf, b.rs, b.hist, b.wts, b))
    parts = list(zip(*fields))
    cat = [np.concatenate(p, axis=0) for p in parts[:5]]
    cfg = parts[5][0]
    sfb = cfg.scale_factor_bits
    sff = cfg.scale_factor_frames
    dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)
    tile = lambda a: jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a))
    )
    res_bytes, sf, rs, hist, wts = (tile(a) for a in cat)
    n = res_bytes.shape[0]
    nsamp = n * fpc * channels
    mcb = batch_max_code_bits(cat[2], 0)
    print(f"chunks={n} samples={nsamp/1e6:.0f}M max_code_bits={mcb} "
          f"B={res_bytes.shape[1]}", file=sys.stderr)
    from sea_codec_tpu.ops.device_decode import _vbr_fetch_geometry

    g = _group_frames(sff, channels)
    w = sf.shape[1]
    gc = g * channels
    n_groups = sff // g
    wg = w * n_groups
    b = res_bytes.shape[1]
    _bw, k1, n_words, _need = _vbr_fetch_geometry(b, gc, mcb)
    print(f"groups/chunk={wg} gc={gc} k1={k1} n_words={n_words}", file=sys.stderr)

    # S1: one-hot matmul neighborhood fetch alone (synthetic uniform bases)
    base8 = jnp.zeros((n, wg), jnp.int32) + (jnp.arange(wg) % k1)

    @jax.jit
    def s1(res, base8):
        need = 4 * (8 * k1 + n_words)
        out = _fetch_neighborhood_matmul(
            jnp.pad(res, ((0, 0), (0, need - b))), base8, k1, n_words)
        return out[:, 0, 0]

    t = timeit(lambda: np.asarray(s1(res_bytes, base8)))
    print(f"S1 matmul fetch alone:        {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S2: full windowed unpack (fetch + extraction chains)
    @jax.jit
    def s2(res, rs_a):
        codes = unpack_var_windowed(res, rs_a.astype(jnp.int32), sff, fpc,
                                    max_code_bits=mcb, matmul_fetch=True)
        return codes[:, 0]

    t = timeit(lambda: np.asarray(s2(res_bytes, rs)))
    print(f"S2 windowed unpack full:      {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S3: unpack + dequant (the full prolog, pinned like production)
    @jax.jit
    def s3(res, sf_a, rs_a):
        codes = unpack_var_windowed(res, rs_a.astype(jnp.int32), sff, fpc,
                                    max_code_bits=mcb, matmul_fetch=True)
        codes = jax.lax.optimization_barrier(codes)
        dq = dequant_codes(codes.reshape(n, fpc, channels), sf_a, rs_a, sfb, sff, 0)
        return dq[:, 0, 0]

    t = timeit(lambda: np.asarray(s3(res_bytes, sf, rs)))
    print(f"S3 prolog (unpack+dequant):   {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S4: full decode with the XLA prolog (fused=False is a static jit arg,
    # so this compiles its own program instead of hitting the fused one)
    def s4():
        return decode_chunks_packed(
            res_bytes, sf, rs, hist, wts, dqt_flat,
            scale_factor_frames=sff, frames=fpc, residual_size=0,
            use_pallas=True, max_code_bits=mcb, fused=False)

    t = timeit(lambda: np.asarray(s4()[0, 0, 0]))
    print(f"S4 full decode (XLA prolog):  {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")

    # S5: fused Pallas extraction+dequant prolog
    from sea_codec_tpu.ops.pallas_dequant import decode_chunks_packed_fused_vbr

    def s5():
        return decode_chunks_packed_fused_vbr(
            res_bytes, sf, rs, hist, wts,
            scale_factor_frames=sff, frames=fpc, sfb=sfb, max_code_bits=mcb)

    t = timeit(lambda: np.asarray(s5()[0, 0, 0]))
    print(f"S5 full decode (fused VBR):   {t*1e3:7.1f} ms  {nsamp/t/1e9:6.2f} Gsps")
    ok = np.array_equal(np.asarray(s5()), np.asarray(s4()))
    print(f"S5 == S4: {ok}")


if __name__ == "__main__":
    main()
