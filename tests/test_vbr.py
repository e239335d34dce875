"""VBR-specific tests (a coverage gap in the reference test suite)."""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.container import CHUNK_TYPE_VBR, SeaChunk, SeaFileHeader
from sea_codec_tpu.models.vbr import interpolate_distribution, normalized_vbr_bitrate
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, audio_quality, gen_test_signal


def test_normalized_bitrate_default():
    # residual_bits=3.0, fpc=5120, sfb=4, sff=20:
    # 3.0 - 128/5120 - 4/20 - 2/20 - 0.05 = 2.625
    v = normalized_vbr_bitrate(3.0, 5120, 4, 20)
    assert np.float32(v) == np.float32(2.625)


def test_interpolate_distribution_sums_to_items():
    for items in (0, 1, 7, 512, 513, 10000):
        for target in (1.5, 2.625, 3.0, 4.9, 7.99):
            m1, t, p1, p2 = interpolate_distribution(items, np.float32(target))
            assert m1 + t + p1 + p2 == items
            assert m1 == 0  # distribution has no target-1 mass


@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("residual_bits", [1.5, 2.5, 3.0, 5.0, 8.0])
def test_vbr_roundtrip_quality(channels, residual_bits):
    samples = gen_test_signal(channels, 30000)
    settings = EncoderSettings(residual_bits=residual_bits, vbr=True)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    decoded = sea_decode(encoded)
    assert decoded.samples.shape == samples.shape
    _, psnr = audio_quality(samples, np.asarray(decoded.samples))
    assert psnr < -17.0, (channels, residual_bits, psnr)


def test_vbr_rate_close_to_target():
    samples = gen_test_signal(2, 100000)
    for target in (2.0, 3.0, 4.0):
        settings = EncoderSettings(residual_bits=target, vbr=True)
        encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, settings)
        bps = len(encoded) * 8 / samples.shape[0]
        assert abs(bps - target) < 0.6, (target, bps)


def test_vbr_chunk_parses_with_mixed_sizes():
    samples = gen_test_signal(2, 20000)
    settings = EncoderSettings(residual_bits=3.0, vbr=True)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, settings)
    import io

    header = SeaFileHeader.from_reader(io.BytesIO(encoded))
    body = encoded[header.serialized_len :]
    chunk = SeaChunk.from_bytes(body[: header.chunk_size], header, 20000)
    assert chunk.chunk_type == CHUNK_TYPE_VBR
    sizes = np.unique(chunk.vbr_residual_sizes)
    assert sizes.size >= 2  # the distribution actually mixes sizes
    assert np.all((sizes >= 1) & (sizes <= 8))
