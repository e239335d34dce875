"""Production-accurate device CBR corpus-encode stage attribution.

Times the EXACT pieces of ``encode_corpus_cbr_packed_blocks`` at the bench
shape (4 blocks x 64 stereo files x 16 chunks): the window-search scan
alone, the device serializer alone, the single-block fused core, and the
full multi-block program. Relay adds ~30 ms fixed dispatch per number:
compare deltas. Usage: python scripts/perf_encode_attribution.py
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
from sea_codec_tpu.ops.encode_file import (
    _corpus_cbr_packed_core,
    _corpus_cbr_scan,
    corpus_n_valid,
    encode_corpus_cbr_packed_blocks,
)
from sea_codec_tpu.ops.serialize_device import corpus_rows_cbr_device
from sea_codec_tpu.utils.signal import varied_signal


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
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    sff, sfb = settings.scale_factor_frames, settings.scale_factor_bits
    nb, nfb, ncb = 4, 64, 16
    bb = nfb * channels
    one_file = varied_signal(channels, ncb * fpc, seed=31337)
    frames_lane = np.full((nb, bb), ncb * fpc, np.int32)
    tail_idx = np.full((nb, nfb), ncb, np.int32)
    h0 = np.broadcast_to(
        np.tile(lms_ops.initial_history(channels), (nfb, 1)), (nb, bb, 4))
    w0 = np.broadcast_to(
        np.tile(lms_ops.initial_weights(channels), (nfb, 1)), (nb, bb, 4))
    p0 = np.zeros((nb, bb), np.int32)
    xdev = jax.block_until_ready(jax.jit(
        lambda x: jnp.tile(x, (nb, 1, 1, nfb)))(
        jnp.asarray(one_file.reshape(ncb, fpc, channels)[None])))
    nsamp = nb * nfb * ncb * fpc * channels
    nsamp1 = nfb * ncb * fpc * channels
    print(f"{nb} blocks x {nfb} files x {ncb} chunks: {nsamp/1e6:.1f} Msamples",
          file=sys.stderr)

    args1 = (xdev[0], jnp.asarray(frames_lane[0]), jnp.asarray(tail_idx[0]),
             jnp.asarray(h0[0]), jnp.asarray(w0[0]), jnp.asarray(p0[0]))

    # S1: window-search scan alone (one block, no serialization/gathers)
    @jax.jit
    def s1(x, fr, h, w_, p):
        nv = corpus_n_valid(fr, ncb, fpc, sff, full_only=False)
        sf, codes, eh, ew, hist, wts, prev = _corpus_cbr_scan(
            x, nv, h, w_, p, sff, sfb, 3, True)
        return sf, codes, eh, ew

    out1 = s1(args1[0], args1[1], args1[3], args1[4], args1[5])
    t = timeit(lambda: np.asarray(
        s1(args1[0], args1[1], args1[3], args1[4], args1[5])[0][0, 0]))
    print(f"S1 search scan (1 block):      {t*1e3:7.1f} ms  {nsamp1/t/1e6:7.1f} Msps-block")

    # S2: device serializer alone on the scan outputs (staged on device)
    sf_d, codes_d, eh_d, ew_d = (jax.block_until_ready(a) for a in out1)

    @jax.jit
    def s2(sf, codes, eh, ew):
        return corpus_rows_cbr_device(sf, codes, eh, ew, nfb, sfb, sff, 3)

    t = timeit(lambda: np.asarray(s2(sf_d, codes_d, eh_d, ew_d)[0, 0, 0]))
    print(f"S2 serializer (1 block):       {t*1e3:7.1f} ms  {nsamp1/t/1e6:7.1f} Msps-block")

    # S3: fused single-block core (search + serialize + tail gathers)
    s3_jit = jax.jit(lambda *a: _corpus_cbr_packed_core(
        *a, scale_factor_frames=sff, scale_factor_bits=sfb,
        residual_size=3, n_files=nfb, use_pallas=True))
    t = timeit(lambda: np.asarray(s3_jit(*args1)[0][0, 0, 0]))
    print(f"S3 fused core (1 block):       {t*1e3:7.1f} ms  {nsamp1/t/1e6:7.1f} Msps-block")

    # S4: production multi-block program
    def s4():
        return encode_corpus_cbr_packed_blocks(
            jnp.asarray(xdev), jnp.asarray(frames_lane), jnp.asarray(tail_idx),
            jnp.asarray(h0), jnp.asarray(w0), jnp.asarray(p0),
            scale_factor_frames=sff, scale_factor_bits=sfb,
            residual_size=3, n_files=nfb, use_pallas=True)

    t = timeit(lambda: np.asarray(s4()[0][0, 0, 0]))
    print(f"S4 production ({nb} blocks):     {t*1e3:7.1f} ms  {nsamp/t/1e6:7.1f} Msps")


if __name__ == "__main__":
    main()
