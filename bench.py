"""Benchmark: corpus encode + chunk-parallel decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: device decode throughput (Msamples/sec on this chip),
measured as program execution forced by a tiny result probe. BASELINE.json's
north star is >=500 Msamples/sec decode on a v5e-8, i.e. 62.5 Msamples/sec
per chip: vs_baseline = value / 62.5.

Methodology note: in this environment the TPU is reached through a relay
tunnel with ~50-200 ms per-call latency and highly variable bulk transfer
(~70 MB/s on a good day, far less on a bad one); a "decode to host PCM"
wall-clock is tunnel-bound, not codec-bound (on a production TPU host the
decoded PCM feeds downstream device compute or a multi-GB/s PCIe link). We
therefore report device-resident decode throughput as the headline and
include the tunnel-bound end-to-end numbers as extras.

Robustness: the headline runs FIRST; every extra is wrapped in a soft
deadline (SEA_BENCH_BUDGET seconds, default 540) and an exception guard, so
a slow tunnel or a flaky remote compile degrades extras to null instead of
killing the JSON line. The persistent compilation cache
(~/.cache/sea_codec_tpu/jax) makes warm reruns skip the multi-minute
encoder compiles.

Diagnostics go to stderr; the single JSON line goes to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T_START = time.perf_counter()
BUDGET = float(os.environ.get("SEA_BENCH_BUDGET", "540"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def left() -> float:
    return BUDGET - (time.perf_counter() - T_START)


def stage(name: str, need_s: float, fn):
    """Run an extra stage if budget remains; None (and keep going) if not."""
    if left() < need_s:
        log(f"[skip] {name}: {left():.0f}s left < {need_s:.0f}s needed")
        return None
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 -- extras must not kill the JSON line
        log(f"[fail] {name}: {type(e).__name__}: {str(e)[:200]}")
        return None


def main() -> None:
    sys.path.insert(0, ".")
    from sea_codec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # warm reruns skip the multi-minute compiles
    import jax
    import jax.numpy as jnp

    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import (
        decode_corpus,
        decode_sea,
        encode_corpus,
        encode_sea,
        parse_full_chunks,
        split_chunks,
    )
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_decode import (
        decode_chunks_packed,
        default_use_pallas,
    )
    from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, audio_quality, gen_test_signal

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform}); budget {BUDGET:.0f}s")

    channels = 2
    n_chunks = 128  # encoded corpus; decode measures on a tiled multiple
    decode_mult = 768  # 98304 chunks / 1007M samples per decode call
    # (the relay adds ~30 ms fixed dispatch+probe cost per call; the batch
    # size amortizes it -- with the int16 dequant stream the sweep measured
    # 3881/4858/4998 Msps at mult 192/512/768, and the halved dq footprint
    # makes 768 comfortable in HBM)
    fpc = 5120
    frames = n_chunks * fpc
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    use_pallas = default_use_pallas()

    log(f"generating {frames} frames x {channels}ch ...")
    samples = gen_test_signal(channels, frames)[: frames * channels]
    n_samples = samples.shape[0]

    # ---- encode once (bytes feed the decode stages + quality check) ----
    log("warming up encoder (compiles the full corpus shape) ...")
    encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    log("encoding ...")
    t0 = time.perf_counter()
    encoded = encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    t_enc = time.perf_counter() - t0
    enc_msps = n_samples / t_enc / 1e6
    ratio = 2 * n_samples / len(encoded)
    log(f"encode: {t_enc:.2f}s = {enc_msps:.2f} Msamples/s, ratio {ratio:.2f}x")

    # ---- device decode (HEADLINE): execution forced by a tiny probe.
    # The chunk batch is tiled to amortize the relay's per-call latency over
    # a corpus-sized batch (every chunk still decodes independently).
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    dqt_flat = jnp.asarray(
        tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32
    )
    # tile ON DEVICE: uploading the host-tiled batch is ~200 MB over a
    # tunnel whose throughput varies 10x run to run; the base batch is <1 MB
    def device_tile(a, reps):
        return jax.block_until_ready(
            jax.jit(lambda x: jnp.tile(x, reps))(jnp.asarray(a))
        )

    args = tuple(
        device_tile(a, (decode_mult,) + (1,) * (a.ndim - 1))
        for a in (batch.res_bytes, batch.sf, batch.rs, batch.hist, batch.wts)
    )
    n_dec_samples = n_samples * decode_mult

    def dev_decode():
        return decode_chunks_packed(
            *args,
            dqt_flat,
            scale_factor_frames=batch.scale_factor_frames,
            frames=fpc,
            residual_size=batch.residual_size,
            use_pallas=use_pallas,
        )

    _ = np.asarray(dev_decode()[0, 0, 0])  # compile + warm
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(dev_decode()[0, 0, 0])  # tiny probe forces execution
        ts.append(time.perf_counter() - t0)
    t_dev = min(ts)
    dev_msps = n_dec_samples / t_dev / 1e6
    log(f"decode device (pallas={use_pallas}): {t_dev * 1e3:.1f} ms = {dev_msps:.1f} Msamples/s")
    del args  # release the tiled decode batch before the extras

    # ---- correctness + quality ----
    decoded = decode_sea(encoded)
    assert decoded.samples.shape[0] == n_samples
    rms, psnr = audio_quality(samples, np.asarray(decoded.samples))
    log(f"psnr: {psnr:.1f} dB")

    # ---- extras (each budget-guarded; None when skipped/failed) ----

    def x_corpus_encode():
        corpus_files = [samples[: 16 * fpc * channels]] * 256
        encode_corpus(corpus_files[:64], TEST_SAMPLE_RATE, channels, settings)
        encode_corpus(corpus_files, TEST_SAMPLE_RATE, channels, settings)
        t0 = time.perf_counter()
        corpus_out = encode_corpus(corpus_files, TEST_SAMPLE_RATE, channels, settings)
        t = time.perf_counter() - t0
        assert corpus_out[0] == corpus_out[255]
        msps = sum(f.shape[0] for f in corpus_files) / t / 1e6
        log(f"corpus encode e2e (256 stereo files): {t:.2f}s = {msps:.1f} Msamples/s")
        return msps

    corpus_msps = stage("corpus_encode", 120, x_corpus_encode)

    def x_device_encode():
        from sea_codec_tpu.ops import lms as lms_ops
        from sea_codec_tpu.ops.encode_file import encode_corpus_cbr_packed_blocks

        nb, nfb, ncb = 4, 64, 16
        bb = nfb * channels
        one_file = samples[: ncb * fpc * channels].reshape(ncb, fpc, channels)
        frames_lane = np.full((nb, bb), ncb * fpc, np.int32)
        tail_idx = np.full((nb, nfb), ncb, np.int32)
        h0 = np.broadcast_to(np.tile(lms_ops.initial_history(channels), (nfb, 1)), (nb, bb, 4))
        w0 = np.broadcast_to(np.tile(lms_ops.initial_weights(channels), (nfb, 1)), (nb, bb, 4))
        p0 = np.zeros((nb, bb), np.int32)
        # tile the ~80 MB lane block on device from the ~300 KB base file
        xdev_d = device_tile(one_file[None], (nb, 1, 1, nfb))

        def dev_encode():
            return encode_corpus_cbr_packed_blocks(
                xdev_d, frames_lane, tail_idx, h0, w0, p0,
                scale_factor_frames=settings.scale_factor_frames,
                scale_factor_bits=settings.scale_factor_bits,
                residual_size=3,
                n_files=nfb,
                use_pallas=use_pallas,
            )

        _ = np.asarray(dev_encode()[0][0, 0, 0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(dev_encode()[0][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        n_enc_dev = nb * nfb * ncb * fpc * channels
        msps = n_enc_dev / min(ts) / 1e6
        log(
            f"corpus encode device-resident ({nb * nfb} files): "
            f"{min(ts) * 1e3:.0f} ms = {msps:.1f} Msamples/s"
        )
        return msps

    enc_dev_msps = stage("device_encode", 90, x_device_encode)

    # ---- BASELINE acceptance config: 1,000-file corpus encode + decode ----
    def x_corpus1k():
        nc1k = 8
        corpus1k = [samples[: nc1k * fpc * channels]] * 1000
        n_1k = sum(f.shape[0] for f in corpus1k)
        encode_corpus(corpus1k[:512], TEST_SAMPLE_RATE, channels, settings)
        t0 = time.perf_counter()
        enc1k = encode_corpus(corpus1k, TEST_SAMPLE_RATE, channels, settings)
        t_enc1k = time.perf_counter() - t0
        enc_msps_1k = n_1k / t_enc1k / 1e6
        log(f"corpus encode e2e (1000 stereo files, {n_1k/1e6:.0f} Msamples): "
            f"{t_enc1k:.2f}s = {enc_msps_1k:.1f} Msamples/s")
        if left() < 90:
            return enc_msps_1k, None
        decode_corpus(enc1k[:300])
        t0 = time.perf_counter()
        dec1k = decode_corpus(enc1k)
        t_dec1k = time.perf_counter() - t0
        dec_msps_1k = n_1k / t_dec1k / 1e6
        assert all(d is not None and d.samples.shape[0] == n_1k // 1000 for d in dec1k)
        np.testing.assert_array_equal(np.asarray(dec1k[0].samples),
                                      np.asarray(dec1k[999].samples))
        log(f"corpus decode e2e (1000 files, incl. full PCM fetch): "
            f"{t_dec1k:.2f}s = {dec_msps_1k:.1f} Msamples/s")
        return enc_msps_1k, dec_msps_1k

    r1k = stage("corpus1000", 150, x_corpus1k) or (None, None)
    enc1k_msps, dec1k_msps = r1k

    # ---- remaining BASELINE acceptance configs (compact shapes) ----
    from sea_codec_tpu import sea_decode, sea_encode

    def x_mono():
        mono = gen_test_signal(1, 16 * fpc)[: 16 * fpc]
        sea_encode(mono, TEST_SAMPLE_RATE, 1, settings)
        t0 = time.perf_counter()
        enc_m = sea_encode(mono, TEST_SAMPLE_RATE, 1, settings)
        dec_m = sea_decode(enc_m)
        t = time.perf_counter() - t0
        assert dec_m.samples.shape[0] == mono.shape[0]
        log(f"mono CBR-3 round trip (81920 frames, single file): {t*1e3:.0f} ms")
        return t * 1e3

    t_mono_ms = stage("mono_roundtrip", 60, x_mono)

    def x_8ch():
        st8 = EncoderSettings(
            residual_bits=3.0, frames_per_chunk=1000, metadata="title=bench\nartist=sea\n"
        )
        eight = gen_test_signal(8, 8 * 1000)[: 8 * 1000 * 8]
        sea_encode(eight, TEST_SAMPLE_RATE, 8, st8)
        t0 = time.perf_counter()
        enc_8 = sea_encode(eight, TEST_SAMPLE_RATE, 8, st8)
        dec_8 = sea_decode(enc_8)
        t = time.perf_counter() - t0
        assert dec_8.channels == 8 and dec_8.samples.shape[0] == eight.shape[0]
        log(f"8-channel + metadata round trip (8000 frames, single file): {t*1e3:.0f} ms")
        return t * 1e3

    t_8_ms = stage("8ch_roundtrip", 60, x_8ch)

    vbr_bytes_cell: list = []

    def x_vbr():
        stv = EncoderSettings(residual_bits=2.5, vbr=True, frames_per_chunk=fpc)
        vbr_files = [samples[: 8 * fpc * channels]] * 64
        n_vbr = sum(f.shape[0] for f in vbr_files)
        encode_corpus(vbr_files, TEST_SAMPLE_RATE, channels, stv)
        t0 = time.perf_counter()
        vbr_out = encode_corpus(vbr_files, TEST_SAMPLE_RATE, channels, stv)
        t = time.perf_counter() - t0
        assert vbr_out[0] == vbr_out[63]
        vbr_bytes_cell.append(vbr_out[0])
        msps = n_vbr / t / 1e6
        log(f"VBR corpus encode (64 stereo files): {t:.2f}s = {msps:.1f} Msamples/s")
        return msps

    vbr_msps = stage("vbr_corpus", 90, x_vbr)

    def x_vbr_decode():
        # device VBR decode on the same tiled-batch methodology as the
        # headline (windowed group-gather unpack; see ops/device_decode.py)
        if not vbr_bytes_cell:
            log("[skip] vbr_decode_device: no VBR bytes (vbr_corpus skipped)")
            return None
        enc_v = vbr_bytes_cell[0]  # 8 chunks x 5120 frames x 2ch
        hdr_v, rect_v, _ = split_chunks(enc_v)
        bv = parse_full_chunks(rect_v, hdr_v)
        dqt_v = jnp.asarray(tables.dqt_stacked(bv.scale_factor_bits).reshape(-1), jnp.int32)
        mult_v = 6144  # 49152 chunks / 503M samples per call (int16 dq
        # sweep: 1891/1952 Msps at 24k/49k chunks, scripts/perf_decode_quick)
        args_v = tuple(
            device_tile(a, (mult_v,) + (1,) * (a.ndim - 1))
            for a in (bv.res_bytes, bv.sf, bv.rs, bv.hist, bv.wts)
        )
        n_v = bv.res_bytes.shape[0] * mult_v * fpc * channels

        def dev_decode_v():
            from sea_codec_tpu.ops.device_decode import batch_max_code_bits as _max_code_bits

            return decode_chunks_packed(
                *args_v,
                dqt_v,
                scale_factor_frames=bv.scale_factor_frames,
                frames=fpc,
                residual_size=bv.residual_size,
                use_pallas=use_pallas,
                max_code_bits=_max_code_bits(bv.rs, bv.residual_size),
            )

        _ = np.asarray(dev_decode_v()[0, 0, 0])
        ts_v = []
        for _ in range(6):
            t0 = time.perf_counter()
            _ = np.asarray(dev_decode_v()[0, 0, 0])
            ts_v.append(time.perf_counter() - t0)
        msps = n_v / min(ts_v) / 1e6
        log(f"VBR decode device: {min(ts_v)*1e3:.1f} ms = {msps:.1f} Msamples/s")
        return msps

    vbr_dec_msps = stage("vbr_decode_device", 90, x_vbr_decode)

    def x_e2e_decode():
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            decode_sea(encoded)
        t = (time.perf_counter() - t0) / reps
        msps = n_samples / t / 1e6
        log(f"decode end-to-end (incl. tunnel PCM fetch): {t * 1e3:.1f} ms = {msps:.1f} Msamples/s")
        return msps

    e2e_msps = stage("e2e_decode", 45, x_e2e_decode)

    def x_device_encode_vbr():
        # device-resident VBR corpus encode (the e2e number is relay-bound;
        # this measures the fused two-pass search + ranking program itself)
        from sea_codec_tpu.models.vbr import (
            interpolate_distribution,
            normalized_vbr_bitrate,
            vbr_base,
        )
        from sea_codec_tpu.ops import lms as lms_ops
        from sea_codec_tpu.ops.encode_file import encode_corpus_vbr_nv_blocks

        nb, nfb, ncb = 4, 64, 16
        bb = nfb * channels
        sff, sfb = settings.scale_factor_frames, settings.scale_factor_bits
        target = normalized_vbr_bitrate(np.float32(2.5), fpc, sfb, sff)
        base = vbr_base(target)
        sortable = (fpc * channels) // sff
        m1, _t, p1, p2 = interpolate_distribution(sortable, target)
        one_file = samples[: ncb * fpc * channels].reshape(ncb, fpc, channels)
        frames_lane = np.full((nb, bb), ncb * fpc, np.int32)
        h0 = np.broadcast_to(np.tile(lms_ops.initial_history(channels), (nfb, 1)), (nb, bb, 4))
        w0 = np.broadcast_to(np.tile(lms_ops.initial_weights(channels), (nfb, 1)), (nb, bb, 4))
        p0 = np.zeros((nb, bb), np.int32)
        xdev_d = device_tile(one_file[None], (nb, 1, 1, nfb))

        def dev_encode_v():
            return encode_corpus_vbr_nv_blocks(
                xdev_d, frames_lane, h0, w0, p0,
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                base=base,
                dist=(m1, p1, p2),
                n_files=nfb,
                use_pallas=use_pallas,
            )

        probe = lambda out: np.asarray(
            (leaf := jax.tree_util.tree_leaves(out)[0])[(0,) * leaf.ndim]
        )
        probe(dev_encode_v())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            probe(dev_encode_v())
            ts.append(time.perf_counter() - t0)
        n_enc_dev = nb * nfb * ncb * fpc * channels
        msps = n_enc_dev / min(ts) / 1e6
        log(
            f"VBR corpus encode device-resident ({nb * nfb} files): "
            f"{min(ts) * 1e3:.0f} ms = {msps:.1f} Msamples/s"
        )
        return msps

    vbr_enc_dev_msps = stage("device_encode_vbr", 120, x_device_encode_vbr)

    baseline_per_chip = 500.0 / 8.0  # BASELINE.json: 500 Msamples/s on v5e-8
    rnd = lambda x, k=2: None if x is None else round(x, k)
    print(
        json.dumps(
            {
                "metric": "decode_Msamples_per_sec_per_chip",
                "value": round(dev_msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(dev_msps / baseline_per_chip, 3),
                "end_to_end_decode_Msps": rnd(e2e_msps),
                "encode_Msps": round(enc_msps, 2),
                "corpus_encode_Msps": rnd(corpus_msps),
                "corpus_encode_device_Msps": rnd(enc_dev_msps),
                "corpus1000_encode_Msps": rnd(enc1k_msps),
                "corpus1000_decode_Msps": rnd(dec1k_msps),
                "mono_roundtrip_ms": rnd(t_mono_ms, 1),
                "multichannel8_roundtrip_ms": rnd(t_8_ms, 1),
                "vbr_corpus_encode_Msps": rnd(vbr_msps),
                "vbr_decode_device_Msps": rnd(vbr_dec_msps),
                "vbr_encode_device_Msps": rnd(vbr_enc_dev_msps),
                "compression_ratio": round(ratio, 2),
                "psnr_db": round(psnr, 1),
                "n_samples": n_samples, "n_decode_samples": n_dec_samples,
                "pallas": bool(use_pallas),
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()
