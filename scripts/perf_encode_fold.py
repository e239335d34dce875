"""Time the device-resident corpus encode stage at fold k = 1/2/4."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from sea_codec_tpu import EncoderSettings
from sea_codec_tpu.ops import encode_file
from sea_codec_tpu.ops import lms as lms_ops
from sea_codec_tpu.utils.signal import gen_test_signal


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    nb, nfb, ncb = 4, 64, 16
    bb = nfb * channels
    samples = gen_test_signal(channels, 16 * fpc)[: 16 * fpc * channels]
    one_file = samples.reshape(ncb, fpc, channels)
    frames_lane = np.full((nb, bb), ncb * fpc, np.int32)
    tail_idx = np.full((nb, nfb), ncb, np.int32)
    h0 = np.broadcast_to(np.tile(lms_ops.initial_history(channels), (nfb, 1)), (nb, bb, 4))
    w0 = np.broadcast_to(np.tile(lms_ops.initial_weights(channels), (nfb, 1)), (nb, bb, 4))
    p0 = np.zeros((nb, bb), np.int32)
    import jax.numpy as jnp

    xdev_d = jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x[None], (nb, 1, 1, nfb)))(jnp.asarray(one_file))
    )
    n_s = nb * nfb * ncb * fpc * channels

    real_fold = encode_file._fold_blocks
    for k in (1, 2, 4):
        encode_file._fold_blocks = lambda nb_, b_, up, _k=k: _k
        fn = jax.jit(
            encode_file.encode_corpus_cbr_packed_blocks.__wrapped__,
            static_argnames=(
                "scale_factor_frames", "scale_factor_bits", "residual_size",
                "n_files", "use_pallas",
            ),
        )

        def dev_encode():
            return fn(
                xdev_d, frames_lane, tail_idx, h0, w0, p0,
                scale_factor_frames=settings.scale_factor_frames,
                scale_factor_bits=settings.scale_factor_bits,
                residual_size=3,
                n_files=nfb,
                use_pallas=True,
            )

        ref = np.asarray(dev_encode()[0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _ = np.asarray(dev_encode()[0][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        print(
            f"k={k}: {min(ts)*1e3:6.0f} ms  {n_s/min(ts)/1e6:6.1f} Msps",
            file=sys.stderr, flush=True,
        )
        if k == 1:
            rows_ref = ref
        else:
            np.testing.assert_array_equal(np.asarray(dev_encode()[0]), rows_ref)
    encode_file._fold_blocks = real_fold
    print("rows bit-identical across folds", file=sys.stderr)


if __name__ == "__main__":
    main()
