"""Benchmark: corpus encode + chunk-parallel decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: decode Msamples/sec on this chip (host container parse +
device unpack/decode, i.e. end-to-end .sea bytes -> PCM). The BASELINE.json
north star is >=500 Msamples/sec decode on a v5e-8; the per-chip share is
62.5 Msamples/sec, so vs_baseline = value / 62.5.

Diagnostics land on stderr; extra JSON fields carry the encode throughput,
device-only decode throughput, compression ratio, and PSNR.
"""

from __future__ import annotations

import io
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    import jax.numpy as jnp

    from sea_codec_tpu import EncoderSettings, SeaEncoder
    from sea_codec_tpu.batch import decode_sea, parse_full_chunks, split_chunks
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_decode import decode_chunks_packed
    from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, audio_quality, gen_test_signal

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    channels = 2
    n_chunks = 256
    fpc = 5120
    frames = n_chunks * fpc
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)

    log(f"generating {frames} frames x {channels}ch ...")
    samples = gen_test_signal(channels, frames)[: frames * channels]
    n_samples = samples.shape[0]

    def encode(sig: np.ndarray) -> bytes:
        reader = io.BytesIO(sig.astype("<i2").tobytes())
        writer = io.BytesIO()
        enc = SeaEncoder(
            channels, TEST_SAMPLE_RATE, sig.shape[0] // channels, settings, reader, writer
        )
        while enc.encode_frame():
            pass
        enc.finalize()
        return writer.getvalue()

    # warm up encode compile on a tiny input with the same chunk shape
    log("warming up encoder ...")
    encode(samples[: fpc * channels * 2])
    log("encoding ...")
    t0 = time.perf_counter()
    encoded = encode(samples)
    t_enc = time.perf_counter() - t0
    enc_msps = n_samples / t_enc / 1e6
    ratio = 2 * n_samples / len(encoded)
    log(f"encode: {t_enc:.2f}s = {enc_msps:.1f} Msamples/s, ratio {ratio:.2f}x")

    # correctness + PSNR
    decoded = decode_sea(encoded)
    assert decoded.samples.shape[0] == n_samples
    rms, psnr = audio_quality(samples, np.asarray(decoded.samples))
    log(f"psnr: {psnr:.1f} dB")

    # end-to-end decode timing (host parse + device unpack + decode)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode_sea(encoded)
    t_dec = (time.perf_counter() - t0) / reps
    dec_msps = n_samples / t_dec / 1e6
    log(f"decode end-to-end: {t_dec * 1e3:.1f} ms = {dec_msps:.1f} Msamples/s")

    # device-only decode timing (arrays resident, excludes host parse)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    dqt_flat = jnp.asarray(tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32)
    args = tuple(
        jnp.asarray(a) for a in (batch.res_bytes, batch.sf, batch.rs, batch.hist, batch.wts)
    )

    def dev_decode():
        return decode_chunks_packed(
            *args,
            dqt_flat,
            scale_factor_frames=batch.scale_factor_frames,
            frames=fpc,
            residual_size=batch.residual_size,
        )

    jax.block_until_ready(dev_decode())  # compile
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dev_decode()
    jax.block_until_ready(out)
    t_dev = (time.perf_counter() - t0) / reps
    dev_msps = n_samples / t_dev / 1e6
    log(f"decode device-only: {t_dev * 1e3:.1f} ms = {dev_msps:.1f} Msamples/s")

    baseline_per_chip = 500.0 / 8.0  # BASELINE.json: 500 Msamples/s on v5e-8
    print(
        json.dumps(
            {
                "metric": "decode_Msamples_per_sec_per_chip",
                "value": round(dec_msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(dec_msps / baseline_per_chip, 3),
                "device_only_decode_Msps": round(dev_msps, 2),
                "encode_Msps": round(enc_msps, 2),
                "compression_ratio": round(ratio, 2),
                "psnr_db": round(psnr, 1),
                "n_samples": n_samples,
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()
