"""Quick full-packed-decode measurement on the bench corpus shape."""

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
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_decode import decode_chunks_packed, default_use_pallas
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    channels, fpc, n_chunks = 2, 5120, 128
    argv = sys.argv[1:]
    vbr = "--vbr" in argv
    mults = [int(a) for a in argv if a != "--vbr"] or [192]
    if vbr:
        settings = EncoderSettings(residual_bits=2.5, vbr=True, frames_per_chunk=fpc)
    else:
        settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    frames = n_chunks * fpc
    samples = gen_test_signal(channels, frames)[: frames * channels]
    encoded = encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    header, rect, _tail = split_chunks(encoded)
    batch = parse_full_chunks(rect, header)
    dqt_flat = jnp.asarray(
        tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), jnp.int32
    )
    use_pallas = default_use_pallas()
    # correctness probe vs the host decode of the same bytes
    from sea_codec_tpu.batch import decode_sea

    ref = np.asarray(decode_sea(encoded).samples)

    for mult in mults:
        args = tuple(
            jnp.asarray(np.tile(a, (mult,) + (1,) * (a.ndim - 1)))
            for a in (batch.res_bytes, batch.sf, batch.rs, batch.hist, batch.wts)
        )
        n_samples = frames * channels * mult

        def dev_decode():
            from sea_codec_tpu.ops.device_decode import batch_max_code_bits as _max_code_bits

            return decode_chunks_packed(
                *args,
                dqt_flat,
                scale_factor_frames=batch.scale_factor_frames,
                frames=fpc,
                residual_size=batch.residual_size,
                use_pallas=use_pallas,
                max_code_bits=_max_code_bits(batch.rs, batch.residual_size),
            )

        out = dev_decode()
        got = np.asarray(out[:n_chunks]).transpose(0, 1, 2).reshape(-1)[: ref.shape[0]]
        np.testing.assert_array_equal(got, ref)
        _ = np.asarray(dev_decode()[0, 0, 0])
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            _ = np.asarray(dev_decode()[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"mult={mult:4d}: {t*1e3:7.1f} ms  {n_samples/t/1e6:8.1f} Msps",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
