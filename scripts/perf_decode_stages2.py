"""Fine-grained decode stage attribution (one variable at a time).

All stages jitted separately; the relay adds ~30 ms fixed dispatch cost to
each number, so compare deltas, not absolutes.
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

from sea_codec_tpu import EncoderSettings
from sea_codec_tpu.batch import encode_sea, parse_full_chunks, split_chunks
from sea_codec_tpu.ops.device_decode import unpack_const_strided
from sea_codec_tpu.ops.pallas_decode import lms_decode_lanes
from sea_codec_tpu.ops.pallas_encode import _rs_constants
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


def timeit(fn, reps=8):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc, n_chunks, mult = 2, 5120, 128, 192
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    sig = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(sig, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    tile = lambda a: jnp.asarray(np.tile(a, (mult,) + (1,) * (a.ndim - 1)))
    res_bytes, sf, rs = tile(batch.res_bytes), tile(batch.sf), tile(batch.rs)
    n, f, c = n_chunks * mult, fpc, channels
    w = sf.shape[1]
    sff = batch.scale_factor_frames
    rsz = batch.residual_size
    sfb = batch.scale_factor_bits
    ns = n * f * c
    print(f"N={n} F={f} C={c} ({ns/1e6:.0f} Ms)", file=sys.stderr)

    sfval_t, _r, c0_t, stepf_t, endv_t, kmax_t, _c = _rs_constants(sfb)

    # E1: unpack only
    @jax.jit
    def e1(res_bytes):
        return unpack_const_strided(res_bytes, rsz, f * c)

    t1 = timeit(lambda: np.asarray(e1(res_bytes)[0, 0]))
    print(f"E1 unpack:              {t1*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E2: window-constant gathers only
    @jax.jit
    def e2(sf, rs):
        sf_w = sf.astype(jnp.int32)
        rs_w = rs.astype(jnp.int32)
        a = jnp.asarray(sfval_t)[rs_w, sf_w]
        b = jnp.asarray(c0_t)[rs_w]
        d = jnp.asarray(stepf_t)[rs_w]
        e = jnp.asarray(endv_t)[rs_w]
        g = jnp.asarray(kmax_t)[rs_w]
        return a + b + d + e + g.astype(jnp.float32)

    t2 = timeit(lambda: np.asarray(e2(sf, rs)[0, 0, 0]))
    print(f"E2 const gathers only:  {t2*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E3: unpack + full dequant (new window-blocked form) -> dq [N, F, C]
    def dequant(codes, sf, rs):
        sf_w = sf.astype(jnp.int32)
        rs_w = rs.astype(jnp.int32)
        sfval_win = jnp.asarray(sfval_t)[rs_w, sf_w]
        c0_win = jnp.asarray(c0_t)[rs_w]
        stepf_win = jnp.asarray(stepf_t)[rs_w]
        endv_win = jnp.asarray(endv_t)[rs_w]
        kmax_win = jnp.asarray(kmax_t)[rs_w]
        q = codes.reshape(n, w, sff, c).astype(jnp.int32)
        pw = lambda x: x[:, :, None, :]
        k = q >> 1
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * pw(stepf_win)
        curve = jnp.where(k == pw(kmax_win), pw(endv_win), curve)
        curve = jnp.where(k == 0, pw(c0_win), curve)
        dq_abs = jnp.floor(pw(sfval_win) * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((q & 1) == 1, -dq_abs, dq_abs)
        return dq.reshape(n, f, c)

    @jax.jit
    def e3(res_bytes, sf, rs):
        return dequant(e1.__wrapped__(res_bytes), sf, rs)

    t3 = timeit(lambda: np.asarray(e3(res_bytes, sf, rs)[0, 0, 0]))
    print(f"E3 unpack+dequant:      {t3*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E4: + lane-major transpose + pad
    b_lanes = n * c
    sub = 32
    lane_block = sub * 128
    b_pad = -(-b_lanes // lane_block) * lane_block

    @jax.jit
    def e4(res_bytes, sf, rs):
        dq = e3.__wrapped__(res_bytes, sf, rs)
        dq_l = dq.transpose(1, 0, 2).reshape(f, b_lanes)
        return jnp.zeros((f, b_pad), jnp.int32).at[:, :b_lanes].set(dq_l)

    t4 = timeit(lambda: np.asarray(e4(res_bytes, sf, rs)[0, 0]))
    print(f"E4 +transpose+pad:      {t4*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E5: kernel only, production config (sub=32, tb=128)
    dq_staged = jax.block_until_ready(e4(res_bytes, sf, rs))
    r = b_pad // 128
    lms_l = jnp.zeros((8, r, 128), jnp.int32)

    def e5():
        out = lms_decode_lanes(
            dq_staged.reshape(f, r, 128), lms_l, time_block=128, sublanes=sub
        )
        return np.asarray(out[0, 0, 0])

    t5 = timeit(e5)
    print(f"E5 kernel (s32,tb128):  {t5*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E5b: kernel, sweep-winning config (sub=16, tb=256)
    b_pad16 = -(-b_lanes // (16 * 128)) * (16 * 128)
    dq16 = dq_staged[:, :b_pad16]
    r16 = b_pad16 // 128
    lms16 = jnp.zeros((8, r16, 128), jnp.int32)

    def e5b():
        out = lms_decode_lanes(
            dq16.reshape(f, r16, 128), lms16, time_block=256, sublanes=16
        )
        return np.asarray(out[0, 0, 0])

    t5b = timeit(e5b)
    print(f"E5b kernel (s16,tb256): {t5b*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # E6: kernel + output epilog ([N, F, C] int16)
    @jax.jit
    def e6(dq3, lms3):
        out = lms_decode_lanes.__wrapped__(dq3, lms3, time_block=128, sublanes=sub)
        out = out.reshape(f, b_pad)[:, :b_lanes]
        return out.reshape(f, n, c).transpose(1, 0, 2).astype(jnp.int16)

    dq3 = dq_staged.reshape(f, r, 128)
    t6 = timeit(lambda: np.asarray(e6(dq3, lms_l)[0, 0, 0]))
    print(f"E6 kernel+epilog:       {t6*1e3:7.1f} ms", file=sys.stderr, flush=True)

    print(
        f"deltas: unpack {t1*1e3:.0f} | gathers {t2*1e3:.0f} | dequant {(t3-t1)*1e3:.0f}"
        f" | transpose {(t4-t3)*1e3:.0f} | kernel {t5*1e3:.0f}/{t5b*1e3:.0f}"
        f" | epilog {(t6-t5)*1e3:.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
