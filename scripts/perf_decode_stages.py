"""Stage-split profile of the packed decode path on the bench corpus shape.

The raw LMS kernel measures ~7.7 Gsps while the full packed decode measures
~1.1 Gsps -- this script attributes the gap by timing partial pipelines, each
jitted separately (stage outputs materialize to HBM, so deltas are an upper
bound on the fused cost, but the ranking is what matters):

  A unpack only              res_bytes -> codes uint8[N, F*C]
  B unpack+dequant           -> dq int32[N, F, C]
  C unpack+dequant+transpose -> dq_l int32[F, N*C] (lane-major, padded)
  D full packed decode       -> pcm int16[N, F, C]
  K kernel only              dq_l -> out (pre-staged input)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from sea_codec_tpu import EncoderSettings
from sea_codec_tpu.batch import encode_sea, parse_full_chunks, split_chunks
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_decode import (
    decode_chunks_packed,
    unpack_const_strided,
)
from sea_codec_tpu.ops.pallas_encode import _rs_constants
from sea_codec_tpu.utils.cache import enable_compilation_cache
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


def timeit(fn, reps=8):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    channels = 2
    fpc = 5120
    n_chunks = 128
    decode_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    samples = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)

    tile = lambda a: jnp.asarray(np.tile(a, (decode_mult,) + (1,) * (a.ndim - 1)))
    res_bytes = tile(batch.res_bytes)
    sf = tile(batch.sf)
    rs = tile(batch.rs)
    hist = tile(batch.hist)
    wts = tile(batch.wts)
    dqt_flat = jnp.asarray(tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32)
    n, f, c = n_chunks * decode_mult, fpc, channels
    n_samples = n * f * c
    sff = batch.scale_factor_frames
    w = sf.shape[1]
    rsz = batch.residual_size
    sfb = batch.scale_factor_bits
    print(f"shape: N={n} F={f} C={c} ({n_samples/1e6:.0f} Msamples), rs={rsz}", file=sys.stderr)

    # --- A: unpack only ---
    @jax.jit
    def stage_a(res_bytes):
        return unpack_const_strided(res_bytes, rsz, f * c)

    t_a = timeit(lambda: np.asarray(stage_a(res_bytes)[0, 0]))
    print(f"A unpack:                    {t_a*1e3:7.1f} ms  {n_samples/t_a/1e9:6.2f} Gsps", file=sys.stderr)

    # --- B: unpack + dequant ---
    sfval_t, _recip, c0_t, stepf_t, endv_t, kmax_t, _cl = _rs_constants(sfb)

    @jax.jit
    def dequant(codes, sf, rs):
        sf_w = sf.astype(jnp.int32)
        rs_w = rs.astype(jnp.int32)
        sfval_win = jnp.asarray(sfval_t)[rs_w, sf_w]
        c0_win = jnp.asarray(c0_t)[rs_w]
        stepf_win = jnp.asarray(stepf_t)[rs_w]
        endv_win = jnp.asarray(endv_t)[rs_w]
        kmax_win = jnp.asarray(kmax_t)[rs_w]

        def pf(x):
            return jnp.repeat(x, sff, axis=1, total_repeat_length=w * sff)[:, :f]

        q = codes.reshape(n, f, c).astype(jnp.int32)
        k = q >> 1
        kf = k.astype(jnp.float32)
        curve = jnp.float32(0.5) + kf * pf(stepf_win)
        curve = jnp.where(k == pf(kmax_win), pf(endv_win), curve)
        curve = jnp.where(k == 0, pf(c0_win), curve)
        dq_abs = jnp.floor(pf(sfval_win) * curve + jnp.float32(0.5)).astype(jnp.int32)
        return jnp.where((q & 1) == 1, -dq_abs, dq_abs)

    @jax.jit
    def stage_b(res_bytes, sf, rs):
        return dequant(unpack_const_strided(res_bytes, rsz, f * c), sf, rs)

    t_b = timeit(lambda: np.asarray(stage_b(res_bytes, sf, rs)[0, 0, 0]))
    print(f"B unpack+dequant:            {t_b*1e3:7.1f} ms  {n_samples/t_b/1e9:6.2f} Gsps", file=sys.stderr)

    # --- C: unpack + dequant + lane-major transpose+pad ---
    from sea_codec_tpu.ops.pallas_decode import SUBLANES

    b_lanes = n * c
    lane_block = SUBLANES * 128
    b_pad = -(-b_lanes // lane_block) * lane_block

    @jax.jit
    def stage_c(res_bytes, sf, rs):
        dq = stage_b.__wrapped__(res_bytes, sf, rs)
        dq_l = dq.transpose(1, 0, 2).reshape(f, b_lanes)
        return jnp.zeros((f, b_pad), jnp.int32).at[:, :b_lanes].set(dq_l)

    t_c = timeit(lambda: np.asarray(stage_c(res_bytes, sf, rs)[0, 0]))
    print(f"C  +transpose+pad:           {t_c*1e3:7.1f} ms  {n_samples/t_c/1e9:6.2f} Gsps", file=sys.stderr)

    # --- D: full packed decode ---
    def stage_d():
        from sea_codec_tpu.ops.device_decode import batch_max_code_bits

        out = decode_chunks_packed(
            res_bytes, sf, rs, hist, wts, dqt_flat,
            scale_factor_frames=sff, frames=f, residual_size=rsz,
            use_pallas=True,
            max_code_bits=batch_max_code_bits(np.asarray(rs), rsz),
        )
        return np.asarray(out[0, 0, 0])

    t_d = timeit(stage_d)
    print(f"D full packed decode:        {t_d*1e3:7.1f} ms  {n_samples/t_d/1e9:6.2f} Gsps", file=sys.stderr)

    # --- K: kernel only on pre-staged lane-major input ---
    from sea_codec_tpu.ops.pallas_decode import lms_decode_lanes

    dq_staged = stage_c(res_bytes, sf, rs)
    dq_staged = jax.block_until_ready(dq_staged)
    r = b_pad // 128
    lms_l = jnp.zeros((8, r, 128), jnp.int32)

    def stage_k():
        out = lms_decode_lanes(
            dq_staged.reshape(f, r, 128), lms_l, time_block=512, sublanes=SUBLANES
        )
        return np.asarray(out[0, 0, 0])

    t_k = timeit(stage_k)
    print(f"K kernel only:               {t_k*1e3:7.1f} ms  {n_samples/t_k/1e9:6.2f} Gsps", file=sys.stderr)
    print(
        f"attribution: unpack {t_a*1e3:.0f} | dequant {(t_b-t_a)*1e3:.0f} | "
        f"transpose {(t_c-t_b)*1e3:.0f} | kernel {t_k*1e3:.0f} | "
        f"sum {(t_c+t_k)*1e3:.0f} vs full {t_d*1e3:.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
