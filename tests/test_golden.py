"""Bit-stability guard: encoded outputs must never change across commits.

The hashes below were produced by the current encoder, whose output is
byte-identical to the independent C++ implementation and decodes bit-exactly
through the upstream C decoder (see test_native.py / test_oracle.py). Any
hash change means the format output changed -- either an intentional,
documented format decision or a regression.
"""

import hashlib

import pytest

from sea_codec_tpu import EncoderSettings, sea_encode
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

GOLDEN = {
    # (channels, frames, residual_bits, vbr, sfb, sff, fpc) -> sha256 prefix
    (1, 12345, 3.0, False, 4, 20, 5120): "36c7e0f4a9513893",
    (2, 30000, 1.0, False, 4, 20, 5120): "674cf939666eb0c4",
    (2, 30000, 8.0, False, 5, 10, 1000): "0b9789e474edda69",
    (3, 20000, 2.5, True, 4, 20, 5120): "76756577fe0ba7dc",
    (2, 9999, 5.0, True, 3, 5, 200): "ee1686aa1c79f633",
}


@pytest.mark.parametrize("key", list(GOLDEN))
def test_encoded_bytes_stable(key):
    channels, frames, rb, vbr, sfb, sff, fpc = key
    samples = gen_test_signal(channels, frames)
    samples = samples[: (samples.shape[0] // channels) * channels]
    settings = EncoderSettings(
        scale_factor_bits=sfb,
        scale_factor_frames=sff,
        residual_bits=rb,
        frames_per_chunk=fpc,
        vbr=vbr,
    )
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    digest = hashlib.sha256(encoded).hexdigest()[:16]
    expected = GOLDEN[key]
    assert expected is not None, f"fill in: {key}: {digest!r}"
    assert digest == expected, (key, digest)
