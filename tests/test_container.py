"""Container framing tests: header fields, metadata, chunk layout, seeking."""

import io

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.container import SeaChunk, SeaFileHeader
from sea_codec_tpu.models import DecoderModel
from sea_codec_tpu.utils.errors import SeaError, SeaInvalidFile
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


def test_header_roundtrip():
    h = SeaFileHeader(
        version=1,
        channels=8,
        chunk_size=4000,
        frames_per_chunk=5120,
        sample_rate=48000,
        total_frames=123456,
        metadata="artist=me\ntitle=x\n",
    )
    data = h.serialize()
    h2 = SeaFileHeader.from_reader(io.BytesIO(data))
    assert h2 == h
    assert len(data) == h.serialized_len


def test_header_layout_bytes():
    h = SeaFileHeader(channels=2, chunk_size=300, frames_per_chunk=512, sample_rate=44100, total_frames=7)
    d = h.serialize()
    assert d[0:4] == b"seac"
    assert d[4] == 1 and d[5] == 2
    assert int.from_bytes(d[6:8], "little") == 300
    assert int.from_bytes(d[8:10], "little") == 512
    assert int.from_bytes(d[10:14], "little") == 44100
    assert int.from_bytes(d[14:18], "little") == 7
    assert int.from_bytes(d[18:22], "little") == 0


def test_bad_magic_rejected():
    with pytest.raises(SeaInvalidFile):
        SeaFileHeader.from_reader(io.BytesIO(b"SEAC" + b"\0" * 30))


def test_metadata_roundtrip_through_codec():
    samples = gen_test_signal(1, 6000)
    settings = EncoderSettings(metadata="artist=test\nyear=2026\n")
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, settings)
    header = SeaFileHeader.from_reader(io.BytesIO(encoded))
    assert header.metadata == "artist=test\nyear=2026\n"
    decoded = sea_decode(encoded)  # metadata must not desync the stream
    assert decoded.samples.shape == samples.shape


@pytest.mark.parametrize("channels", [1, 2, 8, 255])
def test_max_channels_roundtrip(channels):
    rng = np.random.default_rng(42)
    frames = 600
    samples = (rng.standard_normal(frames * channels) * 3000).astype(np.int16)
    settings = EncoderSettings(frames_per_chunk=200)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    decoded = sea_decode(encoded)
    assert decoded.channels == channels
    assert decoded.samples.shape == samples.shape


def test_constant_time_seek():
    """Every chunk is self-contained: decoding chunk k alone == batch decode."""
    channels = 2
    settings = EncoderSettings(frames_per_chunk=1000)
    samples = gen_test_signal(channels, 10240)
    frames = samples.shape[0] // channels
    samples = samples[: frames * channels]
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    batch = np.asarray(sea_decode(encoded).samples)

    header = SeaFileHeader.from_reader(io.BytesIO(encoded))
    body = encoded[header.serialized_len :]
    model = DecoderModel(channels, 4)
    k = 5  # seek straight to the 6th chunk
    start = k * header.chunk_size
    chunk = SeaChunk.from_bytes(
        body[start : start + header.chunk_size], header, frames - k * header.frames_per_chunk
    )
    out = model.decode_chunk(chunk)
    expect = batch[k * header.frames_per_chunk * channels : (k + 1) * header.frames_per_chunk * channels]
    np.testing.assert_array_equal(out, expect)


def test_truncated_stream_raises():
    samples = gen_test_signal(1, 6000)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, EncoderSettings())
    with pytest.raises(SeaError):
        sea_decode(encoded[: len(encoded) - 100])


def test_total_frames_limits_decode():
    """Decoder honors total_frames even with trailing garbage bytes."""
    samples = gen_test_signal(1, 5120)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, EncoderSettings())
    decoded = sea_decode(encoded + b"\xff" * 64)
    assert decoded.samples.shape[0] == 5120


def test_8channel_with_metadata_roundtrip():
    """BASELINE config: 8-channel interleaved encode with metadata embedding."""
    samples = gen_test_signal(8, 4000)
    n = samples.shape[0] // 8
    samples = samples[: n * 8]
    settings = EncoderSettings(
        frames_per_chunk=1000, metadata="title=eight\nartist=chan\n"
    )
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 8, settings)
    header = SeaFileHeader.from_reader(io.BytesIO(encoded))
    assert header.channels == 8
    assert header.metadata == "title=eight\nartist=chan\n"
    decoded = sea_decode(encoded)
    assert decoded.samples.shape == samples.shape
    # per-channel LMS entry state in every chunk: seek into chunk 2 works
    from sea_codec_tpu.batch import decode_range

    got = decode_range(encoded, 2000, 500)
    np.testing.assert_array_equal(got, np.asarray(decoded.samples)[2000 * 8 : 2500 * 8])


def test_many_file_corpus_decode():
    """BASELINE config: corpus decode, chunk-parallel, many files."""
    from sea_codec_tpu.batch import decode_corpus

    samples = gen_test_signal(2, 2000)
    samples = samples[: (samples.shape[0] // 2) * 2]
    one = sea_encode(samples, TEST_SAMPLE_RATE, 2, EncoderSettings(frames_per_chunk=1000))
    expected = np.asarray(sea_decode(one).samples)
    files = [one] * 200
    results = decode_corpus(files)
    assert len(results) == 200
    for r in (results[0], results[99], results[199]):
        np.testing.assert_array_equal(np.asarray(r.samples), expected)


class TestMetadataHelpers:
    """Spec key=value conventions (reference README.md:73-77): newline-
    separated pairs, case-insensitive keys with no '=' or newline, values
    case-sensitive with any char but newline."""

    def test_format_and_parse_roundtrip(self):
        from sea_codec_tpu import format_metadata, parse_metadata

        pairs = {"artist": "Ana=log", "Title": "x  y", "year": "2026"}
        text = format_metadata(pairs)
        assert text == "artist=Ana=log\nTitle=x  y\nyear=2026\n"
        assert parse_metadata(text) == pairs

    def test_empty_dict_formats_empty(self):
        from sea_codec_tpu import format_metadata, parse_metadata

        assert format_metadata({}) == ""
        assert parse_metadata("") == {}

    def test_invalid_keys_rejected(self):
        from sea_codec_tpu import SeaError, format_metadata

        for bad in ({"": "v"}, {"a=b": "v"}, {"a\nb": "v"}):
            with pytest.raises(SeaError):
                format_metadata(bad)
        with pytest.raises(SeaError):
            format_metadata({"k": "line1\nline2"})

    def test_duplicate_keys_case_insensitive(self):
        from sea_codec_tpu import SeaError, format_metadata, parse_metadata

        with pytest.raises(SeaError):
            format_metadata({"Artist": "a", "artist": "b"})
        # lenient parse keeps the first spelling, strict raises
        assert parse_metadata("Artist=a\nartist=b\n") == {"Artist": "a"}
        with pytest.raises(SeaError):
            parse_metadata("Artist=a\nartist=b\n", strict=True)

    def test_lenient_parse_skips_malformed(self):
        from sea_codec_tpu import SeaError, parse_metadata

        assert parse_metadata("noequals\nk=v\n=orphan\n") == {"k": "v"}
        with pytest.raises(SeaError):
            parse_metadata("noequals\n", strict=True)

    def test_helpers_roundtrip_through_codec(self):
        from sea_codec_tpu import format_metadata, lookup_metadata, parse_metadata

        samples = gen_test_signal(1, 6000)
        settings = EncoderSettings(
            metadata=format_metadata({"Artist": "me", "title": "t=v"})
        )
        encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, settings)
        header = SeaFileHeader.from_reader(io.BytesIO(encoded))
        pairs = parse_metadata(header.metadata)
        assert pairs == {"Artist": "me", "title": "t=v"}
        assert lookup_metadata(pairs, "artist") == "me"  # case-insensitive
        assert lookup_metadata(pairs, "missing") is None
