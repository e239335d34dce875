"""Conformance with the reference's published bitrate/compression table
(web/index.html:80-88): CBR bitrate b yields ~(b + 0.2) bits/sample.
"""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_encode
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

# bitrate -> (published bits/sample, published compression ratio)
PUBLISHED = {
    1: (1.2, 13.3),
    2: (2.2, 7.3),
    3: (3.2, 5.0),
    4: (4.2, 3.8),
    5: (5.2, 3.1),
    6: (6.2, 2.6),
    7: (7.2, 2.2),
    8: (8.2, 2.0),
}


@pytest.mark.parametrize("bitrate", sorted(PUBLISHED))
def test_cbr_bits_per_sample_match_published(bitrate):
    samples = gen_test_signal(2, 100000)
    samples = samples[: (samples.shape[0] // 2) * 2]
    encoded = sea_encode(
        samples, TEST_SAMPLE_RATE, 2, EncoderSettings(residual_bits=float(bitrate))
    )
    bps = len(encoded) * 8 / samples.shape[0]
    ratio = samples.shape[0] * 2 / len(encoded)
    pub_bps, pub_ratio = PUBLISHED[bitrate]
    assert abs(bps - pub_bps) < 0.1, (bitrate, bps)
    assert abs(ratio - pub_ratio) / pub_ratio < 0.05, (bitrate, ratio)


def test_fuzz_decoder_never_crashes():
    """Garbage and truncated inputs raise SeaError (or decode), never crash."""
    from sea_codec_tpu import SeaError, sea_decode
    from sea_codec_tpu.batch import decode_sea

    rng = np.random.default_rng(0)
    samples = gen_test_signal(1, 3000)
    valid = sea_encode(samples, TEST_SAMPLE_RATE, 1, EncoderSettings(frames_per_chunk=1000))
    cases = [
        b"",
        b"seac",
        valid[:21],
        valid[:40],
        bytes(rng.integers(0, 256, size=200, dtype=np.uint8)),
        b"seac" + bytes(rng.integers(0, 256, size=100, dtype=np.uint8)),
    ]
    # corrupt chunk-config bytes specifically (sfb/rs nibbles, sff byte)
    for byte_val in (0x00, 0x0F, 0xF0, 0xFF):
        b = bytearray(valid)
        b[22 + 1] = byte_val  # chunk config byte of the first chunk
        cases.append(bytes(b))
        b2 = bytearray(valid)
        b2[22 + 2] = 0  # zero scale_factor_frames
        cases.append(bytes(b2))
    # bit-flipped valid streams
    for _ in range(10):
        b = bytearray(valid)
        for _ in range(5):
            b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        cases.append(bytes(b))
    for data in cases:
        for fn in (sea_decode, decode_sea):
            try:
                fn(data)
            except (SeaError, AssertionError):
                pass  # rejected cleanly


def test_corrupt_streams_raise_sea_error():
    """Regression: corruption classes found by differential fuzzing escaped
    as raw ValueError/UnicodeDecodeError from the fast batch parser instead
    of SeaError (parse_full_chunks lacked the section-bound checks
    SeaChunk.from_bytes has; header metadata decoded UTF-8 unguarded)."""
    from sea_codec_tpu import SeaError, sea_decode
    from sea_codec_tpu.batch import decode_sea

    samples = gen_test_signal(2, 4000)
    valid = sea_encode(
        samples, TEST_SAMPLE_RATE, 2,
        EncoderSettings(frames_per_chunk=1000, metadata="k=v\n"),
    )
    valid_vbr = sea_encode(
        samples, TEST_SAMPLE_RATE, 2,
        EncoderSettings(frames_per_chunk=1000, vbr=True, residual_bits=2.5),
    )

    cases = []
    b = bytearray(valid)
    b[24] = 0xE0  # metadata bytes (offset 24..27) no longer valid UTF-8
    cases.append(bytes(b))
    b = bytearray(valid)
    b[5] = 200  # channels: LMS section alone now exceeds chunk_size
    cases.append(bytes(b))
    b = bytearray(valid)
    b[5] = 9  # channels: sections overrun chunk_size mid-chunk
    cases.append(bytes(b))
    b = bytearray(valid_vbr)
    b[5] = 5  # channels up on a VBR stream: residual section overrun
    cases.append(bytes(b))

    for data in cases:
        for fn in (sea_decode, decode_sea):
            with pytest.raises(SeaError):
                fn(data)


def test_encode_input_validation():
    """Float PCM must be rejected loudly (a silent int16 cast turns
    normalized [-1,1] float audio into all-zero samples), 2-D input must
    not surface as an internal reshape error, and safe integer dtypes
    convert."""
    from sea_codec_tpu import SeaError, sea_decode, sea_encode
    from sea_codec_tpu.batch import encode_corpus
    from sea_codec_tpu.batch import encode_sea as batch_encode

    good = gen_test_signal(2, 2000)
    for fn in (sea_encode, batch_encode):
        with pytest.raises(SeaError):
            fn(good.astype(np.float32) / 32768.0, TEST_SAMPLE_RATE, 2)
        with pytest.raises(SeaError):
            fn(good.reshape(-1, 2), TEST_SAMPLE_RATE, 2)
        with pytest.raises(SeaError):
            fn(good.astype(np.int32) * 100, TEST_SAMPLE_RATE, 2)  # overflow
    with pytest.raises(SeaError):
        encode_corpus([good, good.astype(np.float64)], TEST_SAMPLE_RATE, 2)
    # int32 values within i16 range convert losslessly
    enc = sea_encode(good.astype(np.int32), TEST_SAMPLE_RATE, 2)
    assert np.array_equal(
        sea_decode(enc).samples,
        sea_decode(sea_encode(good, TEST_SAMPLE_RATE, 2)).samples,
    )
    # plain Python list input still works (asarray -> int64 -> checked cast)
    enc2 = sea_encode(good.tolist(), TEST_SAMPLE_RATE, 2)
    assert enc2 == enc
