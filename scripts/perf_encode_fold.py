"""Time the device-resident corpus encode stage at fold k = 1/2/4.

Fold k merges k 128-lane blocks into one lane-packed call of k*64 files
(512 lanes at k=4), trading ``lax.map`` sequential steps for wider Pallas
kernel rows. Round 2 measured e2e flat (544/548/557 Msps) because the
serializer's int32 bit plane dominated; re-run after the closed-form
periodic packer (scripts/perf_encode_attribution.py).
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
from sea_codec_tpu.ops import lms as lms_ops
from sea_codec_tpu.ops.encode_file import encode_corpus_cbr_packed_blocks
from sea_codec_tpu.utils.signal import varied_signal


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    nb, nfb, ncb = 4, 64, 16
    bb = nfb * channels
    one_file = varied_signal(channels, ncb * fpc, seed=31337)
    frames_lane = np.full((nb, bb), ncb * fpc, np.int32)
    tail_idx = np.full((nb, nfb), ncb, np.int32)
    h0 = np.broadcast_to(np.tile(lms_ops.initial_history(channels), (nfb, 1)), (nb, bb, 4))
    w0 = np.broadcast_to(np.tile(lms_ops.initial_weights(channels), (nfb, 1)), (nb, bb, 4))
    p0 = np.zeros((nb, bb), np.int32)
    xdev = jax.block_until_ready(jax.jit(
        lambda x: jnp.tile(x, (nb, 1, 1, nfb)))(
        jnp.asarray(one_file.reshape(ncb, fpc, channels)[None])))
    n_s = nb * nfb * ncb * fpc * channels

    def fold(a, k, lane_axis=None):
        """[NB, ...] -> [NB//k, ...] with the k merged along the lane/file
        axis (lane order file-major, so concat preserves layout)."""
        g = nb // k
        if lane_axis is None:  # [NB, B] or [NB, nf] style
            return np.asarray(a).reshape(g, k * a.shape[1], *a.shape[2:])
        # samples [NB, nc, fpc, B]: merge along B
        x = jnp.asarray(a).reshape(g, k, *a.shape[1:])
        return jnp.concatenate([x[:, i] for i in range(k)], axis=-1)

    rows_ref = None
    for k in (1, 2, 4):
        g = nb // k
        xk = jax.block_until_ready(fold(xdev, k, lane_axis=-1))
        fk = fold(frames_lane, k)
        tk = fold(tail_idx, k)
        hk = np.asarray(h0).reshape(g, k * bb, 4)
        wk = np.asarray(w0).reshape(g, k * bb, 4)
        pk = fold(p0, k)

        def dev_encode():
            return encode_corpus_cbr_packed_blocks(
                xk, fk, tk, hk, wk, pk,
                scale_factor_frames=settings.scale_factor_frames,
                scale_factor_bits=settings.scale_factor_bits,
                residual_size=3, n_files=k * nfb, use_pallas=True)

        ref = np.asarray(dev_encode()[0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _ = np.asarray(dev_encode()[0][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        print(f"k={k}: {min(ts)*1e3:6.0f} ms  {n_s/min(ts)/1e6:6.1f} Msps",
              file=sys.stderr, flush=True)
        flat = ref.reshape(nb, nfb, ncb, -1)
        if k == 1:
            rows_ref = flat
        else:
            np.testing.assert_array_equal(flat, rows_ref)
    print("rows bit-identical across folds", file=sys.stderr)


if __name__ == "__main__":
    main()
