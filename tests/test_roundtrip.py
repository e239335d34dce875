"""End-to-end round-trip tests (modeled on reference tests/test.rs)."""

import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, audio_quality, gen_test_signal


def _roundtrip(samples, channels, settings=None):
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    decoded = sea_decode(encoded)
    return encoded, decoded


def test_smoke_mono_cbr():
    samples = gen_test_signal(1, 5000)
    encoded, decoded = _roundtrip(samples, 1)
    assert decoded.channels == 1
    assert decoded.sample_rate == TEST_SAMPLE_RATE
    assert decoded.samples.shape == samples.shape
    rms, psnr = audio_quality(samples, decoded.samples)
    assert psnr < -20.0, (rms, psnr)


@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize(
    "length_frames",
    [99, 100, 101, 4999, 5000, 5001, 5120, 5121, 10240, 10241],
)
def test_sample_len(channels, length_frames):
    """Length preservation around chunk/window boundaries (test.rs:8-33)."""
    samples = gen_test_signal(channels, length_frames)
    # gen_test_signal appends the channel delay; use exact frame count instead
    frames = samples.shape[0] // channels
    samples = samples[: frames * channels]
    _, decoded = _roundtrip(samples, channels)
    assert decoded.samples.shape[0] == samples.shape[0]


@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("scale_factor_bits", [3, 4, 5])
@pytest.mark.parametrize("residual_bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_parameters(channels, scale_factor_bits, residual_bits):
    """Quality gate across the settings sweep (test.rs:35-64)."""
    samples = gen_test_signal(channels, 20000)
    settings = EncoderSettings(
        scale_factor_bits=scale_factor_bits,
        residual_bits=float(residual_bits),
        frames_per_chunk=5120,
    )
    _, decoded = _roundtrip(samples, channels, settings)
    assert decoded.samples.shape == samples.shape
    rms, psnr = audio_quality(samples, decoded.samples)
    assert psnr < -20.0, (channels, scale_factor_bits, residual_bits, rms, psnr)


@pytest.mark.parametrize("scale_factor_bits", [1, 2, 6, 8])
def test_extreme_scale_factor_bits(scale_factor_bits):
    """The API (unlike the CLI) allows sfb outside 3..5; round trips hold."""
    samples = gen_test_signal(2, 6000)
    samples = samples[: (samples.shape[0] // 2) * 2]
    settings = EncoderSettings(
        scale_factor_bits=scale_factor_bits, frames_per_chunk=1000
    )
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, settings)
    decoded = sea_decode(encoded)
    assert decoded.samples.shape == samples.shape
    _, psnr = audio_quality(samples, decoded.samples)
    assert psnr < -15.0, (scale_factor_bits, psnr)


def test_255_channels_end_to_end():
    """The published channel-count ceiling (reference README.md:15, header
    field u8): encode -> decode at 255 channels through both engines, with
    the >128-lane XLA fallback on the batch path and a ragged tail chunk."""
    import numpy as np

    from sea_codec_tpu.batch import decode_sea, encode_sea

    c = 255
    frames = 230  # 2 full chunks of 100 + ragged 30
    rng = np.random.default_rng(255)
    base = gen_test_signal(1, frames)[:frames].astype(np.int32)
    # decorrelate channels cheaply: per-channel circular shift + noise
    samples = np.stack(
        [np.roll(base, k % 17) + rng.integers(-50, 50) for k in range(c)], axis=1
    )
    samples = np.clip(samples, -32768, 32767).astype(np.int16).reshape(-1)
    st = EncoderSettings(
        frames_per_chunk=100, scale_factor_frames=10, residual_bits=4.0
    )

    enc_session = sea_encode(samples, TEST_SAMPLE_RATE, c, st, engine="session")
    enc_batch = encode_sea(samples, TEST_SAMPLE_RATE, c, st)
    assert enc_session == enc_batch

    for decoded in (sea_decode(enc_batch), decode_sea(enc_batch)):
        assert decoded.channels == c
        out = np.asarray(decoded.samples)
        assert out.shape[0] == frames * c
        rms, psnr = audio_quality(samples, out)
        assert psnr < -20.0, psnr

@pytest.mark.parametrize(
    "fpc,sff,frames",
    [
        (200, 20, 450),      # CLI lower chunk-size bound (seaconv.rs:23-26)
        (32000, 20, 48000),  # CLI upper chunk-size bound + ragged tail
        (200, 1, 450),       # scalefactor-distance lower bound (>= 1)
        (200, 200, 450),     # one window per chunk (sff == fpc)
    ],
)
def test_chunk_size_bounds(fpc, sff, frames):
    """Round trips at the CLI's chunk-size/scalefactor-distance extremes,
    byte-identical to the independent native codec."""
    import numpy as np

    from sea_codec_tpu.batch import encode_sea
    from sea_codec_tpu.native import binding

    channels = 2
    samples = gen_test_signal(channels, frames)[: frames * channels]
    st = EncoderSettings(frames_per_chunk=fpc, scale_factor_frames=sff)

    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, st)
    assert encoded == encode_sea(samples, TEST_SAMPLE_RATE, channels, st)
    if binding.available():
        assert encoded == binding.native_encode(
            samples, TEST_SAMPLE_RATE, channels,
            scale_factor_frames=sff, frames_per_chunk=fpc,
        )
    decoded = sea_decode(encoded)
    assert decoded.samples.shape == samples.shape
    _, psnr = audio_quality(samples, np.asarray(decoded.samples))
    assert psnr < -20.0, (fpc, sff, psnr)
