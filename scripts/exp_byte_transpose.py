"""A/B: uint8 byte-plane transpose vs int32-packed transpose in the fused
CBR decode prolog.

Hypothesis (docs/PERF.md): the XLA uint8 [N,B]->[B,N] transpose costs ~4 ms
per Gsample vs a ~1 ms HBM roofline because lane shuffles are per-element;
bitcasting 4 bytes to one int32 before the transpose quarters the shuffled
element count, and the kernel re-expands bytes in-register (2 vector ops
per byte row). Usage: python scripts/exp_byte_transpose.py [mult]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from sea_codec_tpu.batch import parse_full_chunks, split_chunks
from sea_codec_tpu.native.binding import native_encode
from sea_codec_tpu.ops.device_decode import _dequant_window_constants
from sea_codec_tpu.ops.pallas_dequant import _plan_blocks
from sea_codec_tpu.ops.pallas_fused_decode import (
    G_SUB,
    decode_cbr_fused_single,
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


@partial(jax.jit, static_argnames=("sff", "frames", "rs", "sfb", "packed32"))
def decode_variant(res_bytes, sf_codes, hist0, wts0, sff, frames, rs, sfb,
                   packed32):
    n, w, c = sf_codes.shape
    m, wp = _plan_blocks(w, sff, c, rs)
    lane_block = G_SUB * 128
    npad = -(-n // lane_block) * lane_block
    gt = npad // 128
    btot = (wp // m) * ((m * sff * c * rs) // 8)
    breal = min(res_bytes.shape[1], btot)
    if packed32:
        rows8 = jnp.zeros((n, btot), jnp.uint8).at[:, :breal].set(
            res_bytes[:, :breal])
        r32 = jax.lax.bitcast_convert_type(
            rows8.reshape(n, btot // 4, 4), jnp.int32)
        feed = jnp.zeros((btot // 4, npad), jnp.int32).at[:, :n].set(
            r32.T).reshape(btot // 4, gt, 128)
    else:
        feed = jnp.zeros((btot, npad), jnp.uint8).at[:breal, :n].set(
            res_bytes[:, :breal].T).reshape(btot, gt, 128)
    sfval_win, *_ = _dequant_window_constants(
        sf_codes.astype(jnp.int32), jnp.full((n, w, c), rs, jnp.int32),
        sfb, rs)
    sfvalT = jnp.zeros((wp, c, npad), jnp.float32).at[:w, :, :n].set(
        jnp.transpose(sfval_win, (1, 2, 0)))
    state = jnp.concatenate([hist0, wts0], axis=-1)
    lms = jnp.zeros((8, c, npad), jnp.int32).at[:, :, :n].set(
        jnp.transpose(state, (2, 1, 0)))
    out = decode_cbr_fused_single(
        feed, sfvalT.reshape(wp, c, gt, 128), lms.reshape(8, c, gt, 128),
        rs=rs, sff=sff, c=c, m=m, packed32=packed32)
    return out.reshape(wp * sff, c, npad)[:frames, :, :n].transpose(2, 0, 1)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    files = [varied_signal(channels, 8 * fpc, seed=1000 + i)
             for i in range(16)]
    blobs = [native_encode(f, TEST_SAMPLE_RATE, channels,
                           frames_per_chunk=fpc) for f in files]
    fields = []
    cfg = None
    for enc in blobs:
        h, rect, _ = split_chunks(enc)
        b = parse_full_chunks(rect, h)
        cfg = cfg or b
        fields.append((b.res_bytes, b.sf, b.hist, b.wts))
    cat = [np.concatenate(p, axis=0) for p in zip(*fields)]
    sff, sfb, rs = (cfg.scale_factor_frames, cfg.scale_factor_bits,
                    cfg.residual_size)
    tile = lambda a: jax.block_until_ready(jax.jit(
        lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a)))
    res_bytes, sf, hist, wts = (tile(a) for a in cat)
    n = res_bytes.shape[0]
    nsamp = n * fpc * channels
    print(f"chunks={n} samples={nsamp / 1e6:.0f}M", file=sys.stderr)

    run = lambda p32: decode_variant(res_bytes, sf, hist, wts, sff, fpc,
                                     rs, sfb, p32)
    a = np.asarray(run(False)[:64])
    b = np.asarray(run(True)[:64])
    assert np.array_equal(a, b), "packed32 output != uint8 output"
    print("bit-identical on 64-chunk prefix", file=sys.stderr)

    for name, p32 in (("uint8 transpose ", False), ("int32 transpose ", True)):
        t = timeit(lambda: np.asarray(run(p32)[0, 0, 0]))
        s = stream(lambda: run(p32))
        print(f"{name}: single {t * 1e3:7.1f} ms {nsamp / t / 1e9:6.2f} Gsps"
              f" | sustained {s * 1e3:7.1f} ms {nsamp / s / 1e9:6.2f} Gsps",
              file=sys.stderr)


if __name__ == "__main__":
    main()
