"""Production-accurate CBR decode stage attribution.

Times the EXACT production pieces (mirrors
decode_chunks_fn's CBR path) so deltas correspond to the shipped program.
Relay adds ~30 ms fixed dispatch per number: compare deltas.
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
from sea_codec_tpu.ops.device_decode import (
    decode_chunks_packed,
    dequant_codes,
    unpack_const_strided,
)
from sea_codec_tpu.ops.pallas_decode import decode_scan_pallas_lanes
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
    channels, fpc, n_chunks = 2, 5120, 128
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    sig = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(sig, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    from sea_codec_tpu.ops import tables

    dqt_flat = jnp.asarray(tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32)
    tile = lambda a: jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a))
    )
    res_bytes, sf, rs = tile(batch.res_bytes), tile(batch.sf), tile(batch.rs)
    hist, wts = tile(batch.hist), tile(batch.wts)
    n, f, c = n_chunks * mult, fpc, channels
    w = sf.shape[1]
    sff = batch.scale_factor_frames
    rsz = batch.residual_size
    sfb = batch.scale_factor_bits
    ns = n * f * c
    print(f"N={n} F={f} C={c} ({ns/1e6:.0f} Ms)", file=sys.stderr, flush=True)

    count = f * c

    # S1: unpack only (production kernel)
    @jax.jit
    def s1(res_bytes):
        return unpack_const_strided(res_bytes, rsz, count)

    t1 = timeit(lambda: np.asarray(s1(res_bytes)[0, 0]))
    print(f"S1 unpack:            {t1*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # the SHARED production dequant (device_decode.dequant_codes) so the
    # attribution can never drift from the shipped math
    @jax.jit
    def s2(res_bytes, sf_codes):
        codes = unpack_const_strided(res_bytes, rsz, count)
        rs_w = jnp.full((n, w, c), rsz, jnp.uint8)
        return dequant_codes(
            codes.reshape(n, f, c), sf_codes, rs_w, sfb, sff, static_rs=rsz
        )

    t2 = timeit(lambda: np.asarray(s2(res_bytes, sf)[0, 0, 0]))
    print(f"S2 +dequant [N,F,C]:  {t2*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # S3: + lane-major transpose (the kernel caller's first step)
    @jax.jit
    def s3(res_bytes, sf_codes):
        dq = s2.__wrapped__(res_bytes, sf_codes)
        return dq.transpose(1, 0, 2).reshape(f, n * c)

    t3 = timeit(lambda: np.asarray(s3(res_bytes, sf)[0, 0]))
    print(f"S3 +transpose:        {t3*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # S4: + Pallas kernel + epilog (the full production pipeline, separately
    # jitted so S3 stays comparable)
    @jax.jit
    def s4(res_bytes, sf_codes, hist, wts):
        dq_l = s3.__wrapped__(res_bytes, sf_codes)
        return decode_scan_pallas_lanes(dq_l, hist, wts, n, c)

    t4 = timeit(lambda: np.asarray(s4(res_bytes, sf, hist, wts)[0, 0, 0]))
    print(f"S4 +kernel+epilog:    {t4*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # S5: the shipped single program for reference
    def s5():
        out = decode_chunks_packed(
            res_bytes, sf, rs, hist, wts, dqt_flat,
            scale_factor_frames=sff, frames=f, residual_size=rsz,
            use_pallas=True,
        )
        return np.asarray(out[0, 0, 0])

    t5 = timeit(s5)
    print(f"S5 production:        {t5*1e3:7.1f} ms  {ns/t5/1e9:5.2f} Gsps", file=sys.stderr, flush=True)
    print(
        f"deltas: unpack {t1*1e3:.0f} | dequant {(t2-t1)*1e3:.0f} | "
        f"transpose {(t3-t2)*1e3:.0f} | kernel+epilog {(t4-t3)*1e3:.0f}",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__" and "--proto" not in sys.argv and "--kchain" not in sys.argv:
    main()


def proto_lane_major():
    """S6/S7: dequant in [W, sff, C*N] channel-major-lane layout (no tile
    padding, constants broadcast along clean axes) + kernel on reordered
    lanes. Checks bit-equality against the production program."""
    import sys
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import encode_sea, parse_full_chunks, split_chunks
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_decode import (
        _select_chain,
        decode_chunks_packed,
        unpack_const_strided,
    )
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

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc, n_chunks = 2, 5120, 128
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    sig = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(sig, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    dqt_flat = jnp.asarray(tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32)
    tile = lambda a: jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a))
    )
    res_bytes, sf, rs = tile(batch.res_bytes), tile(batch.sf), tile(batch.rs)
    hist, wts = tile(batch.hist), tile(batch.wts)
    n, f, c = n_chunks * mult, fpc, channels
    w = sf.shape[1]
    sff = batch.scale_factor_frames
    rsz = batch.residual_size
    sfb = batch.scale_factor_bits
    ns = n * f * c
    count = f * c
    cn = c * n
    print(f"N={n} ({ns/1e6:.0f} Ms) lane-major proto", file=sys.stderr, flush=True)

    sfval_t, _r, c0_t, stepf_t, endv_t, kmax_t, _c = _rs_constants(sfb)
    c0_s = jnp.float32(c0_t[rsz])
    stepf_s = jnp.float32(stepf_t[rsz])
    endv_s = jnp.float32(endv_t[rsz])
    kmax_s = jnp.int32(int(kmax_t[rsz]))

    def dequant_lane(res_bytes, sf_codes):
        codes = unpack_const_strided(res_bytes, rsz, count)  # [N, count]
        qt = codes.T.reshape(w, sff, cn)  # lane = cv*N + n
        sf_w = sf_codes.astype(jnp.int32)  # [N, W, C]
        sfval_win = _select_chain(sf_w, sfval_t[rsz], jnp.float32)
        sfval_l = jnp.moveaxis(sfval_win, 0, 2).reshape(w, 1, cn)
        q32 = qt.astype(jnp.int32)
        k = q32 >> 1
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepf_s
        curve = jnp.where(k == kmax_s, endv_s, curve)
        curve = jnp.where(k == 0, c0_s, curve)
        dq_abs = jnp.floor(sfval_l * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((q32 & 1) == 1, -dq_abs, dq_abs).astype(jnp.int16)
        return dq.reshape(w * sff, cn)  # [F, CN]

    @jax.jit
    def s6(res_bytes, sf_codes):
        return dequant_lane(res_bytes, sf_codes)

    t6 = timeit(lambda: np.asarray(s6(res_bytes, sf)[0, 0]))
    print(f"S6 lane-major dequant: {t6*1e3:7.1f} ms", file=sys.stderr, flush=True)

    sub = 32
    b_pad = -(-cn // (sub * 128)) * (sub * 128)

    @jax.jit
    def s7(res_bytes, sf_codes, hist, wts):
        dq_l = dequant_lane(res_bytes, sf_codes)
        if b_pad != cn:
            dq_l = jnp.zeros((f, b_pad), dq_l.dtype).at[:, :cn].set(dq_l)
        state = jnp.concatenate([hist, wts], axis=-1)  # [N, C, 8]
        st_l = jnp.moveaxis(state, 1, 0).reshape(cn, 8).T  # lane = cv*N+n
        lms_l = jnp.zeros((8, b_pad), jnp.int32).at[:, :cn].set(st_l)
        r = b_pad // 128
        out = lms_decode_lanes(
            dq_l.reshape(f, r, 128), lms_l.reshape(8, r, 128),
            time_block=128, sublanes=sub,
        )
        out = out.reshape(f, b_pad)[:, :cn]
        return jnp.moveaxis(out.reshape(f, c, n), 2, 0)  # [N, F, C]

    t7 = timeit(lambda: np.asarray(s7(res_bytes, sf, hist, wts)[0, 0, 0]))
    print(f"S7 full lane-major:    {t7*1e3:7.1f} ms  {ns/t7/1e9:5.2f} Gsps", file=sys.stderr, flush=True)

    # bit-equality vs production
    want = decode_chunks_packed(
        res_bytes[:256], sf[:256], rs[:256], hist[:256], wts[:256], dqt_flat,
        scale_factor_frames=sff, frames=f, residual_size=rsz, use_pallas=True,
    )
    got = s7(res_bytes, sf, hist, wts)[:256]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("bit-exact vs production", file=sys.stderr, flush=True)


if __name__ == "__main__" and "--proto" in sys.argv:
    proto_lane_major()


def proto_kchain():
    """S8: CBR dequant via integer dqt-entry select chains (no f32 math).

    For static rs, dq(sf, q) is a table of 2^rs entries per scale factor;
    expand each entry to a per-window [N, W, C] constant (select chain over
    sf) and pick per-code with a k-chain (depth 2^(rs-1)-1) + sign select.
    Pure int ops -- tests whether the f32 converts/floor are the dequant's
    real cost.
    """
    import sys
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import encode_sea, parse_full_chunks, split_chunks
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_decode import _select_chain, unpack_const_strided
    from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

    def timeit(fn, reps=8):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc, n_chunks = 2, 5120, 128
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    sig = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(sig, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    tile = lambda a: jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult,) + (1,) * (x.ndim - 1)))(jnp.asarray(a))
    )
    res_bytes, sf = tile(batch.res_bytes), tile(batch.sf)
    n, f, c = n_chunks * mult, fpc, channels
    w = sf.shape[1]
    sff = batch.scale_factor_frames
    rsz = batch.residual_size
    sfb = batch.scale_factor_bits
    ns = n * f * c
    count = f * c
    print(f"N={n} ({ns/1e6:.0f} Ms) k-chain proto rs={rsz}", file=sys.stderr, flush=True)

    # dqt entries for this rs: [n_sf, 2^rsz] int32 (sign interleaved)
    dqt_rs = tables.dqt_stacked(sfb)[rsz - 1]  # [n_sf, 256]
    kvals = dqt_rs[:, 0 : 1 << rsz : 2]  # positive entries per k

    @jax.jit
    def s8(res_bytes, sf_codes):
        codes = unpack_const_strided(res_bytes, rsz, count)  # [N, count]
        sf_w = sf_codes.astype(jnp.int32)  # [N, W, C]
        # per-window positive dqt entry for each k (tiny [N, W, C] arrays)
        val_w = [
            _select_chain(sf_w, kvals[:, k].astype(np.int32), jnp.int32).astype(
                jnp.int16
            )
            for k in range(1 << (rsz - 1))
        ]
        q = codes.reshape(n, w, sff, c)
        k = (q >> 1).astype(jnp.int32)
        pw = lambda x: x[:, :, None, :]
        acc = jnp.broadcast_to(pw(val_w[0]), k.shape)
        for ki in range(1, len(val_w)):
            acc = jnp.where(k == ki, pw(val_w[ki]), acc)
        dq = jnp.where((q & 1) == 1, -acc.astype(jnp.int16), acc.astype(jnp.int16))
        return dq.reshape(n, w * sff, c)[:, :f]

    t8 = timeit(lambda: np.asarray(s8(res_bytes, sf)[0, 0, 0]))
    print(f"S8 k-chain dequant:   {t8*1e3:7.1f} ms", file=sys.stderr, flush=True)

    # bit-equality vs the f32 production dequant on a slice
    from sea_codec_tpu.ops.device_decode import dequant_codes

    @jax.jit
    def ref(res_bytes, sf_codes):
        codes = unpack_const_strided(res_bytes, rsz, count)
        rs_w = jnp.full((n, w, c), rsz, jnp.uint8)
        return dequant_codes(
            codes.reshape(n, f, c), sf_codes, rs_w, sfb, sff, static_rs=rsz
        )

    np.testing.assert_array_equal(
        np.asarray(s8(res_bytes, sf)[:64]), np.asarray(ref(res_bytes, sf)[:64])
    )
    print("bit-exact vs f32 dequant", file=sys.stderr, flush=True)


if __name__ == "__main__" and "--kchain" in sys.argv:
    proto_kchain()
