"""TPU check: folded wide-lane corpus encode is byte-identical to the
independent single-file fast path, CBR and VBR, plus a perf probe."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from sea_codec_tpu import EncoderSettings
from sea_codec_tpu.batch import encode_corpus, encode_sea
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc = 2, 5120
    sig = gen_test_signal(channels, 16 * fpc + 707)

    # 256 identical-length files -> nb = 4 blocks -> fold k = 4 (512 lanes);
    # plus a ragged-length mix exercising tails inside the folded lanes
    for name, st in (
        ("CBR", EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)),
        ("VBR", EncoderSettings(residual_bits=2.5, vbr=True, frames_per_chunk=fpc)),
    ):
        files = (
            [sig[: 16 * fpc * channels]] * 126
            + [sig[: (8 * fpc + 707) * channels], sig[: 3 * fpc * channels]]
            + [sig[: 16 * fpc * channels]] * 128
        )  # 256 files -> nb = 4 blocks -> fold k = 4 (512 kernel lanes)
        t0 = time.perf_counter()
        got = encode_corpus(files, TEST_SAMPLE_RATE, channels, st)
        t = time.perf_counter() - t0
        n = sum(f.shape[0] for f in files)
        for i in (0, 64, 126, 127, 255):
            want = encode_sea(files[i], TEST_SAMPLE_RATE, channels, st)
            assert got[i] == want, f"{name}: file {i} differs"
        print(
            f"{name}: byte-identical (256 files incl. ragged), "
            f"{t:.2f}s = {n / t / 1e6:.1f} Msps e2e",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
