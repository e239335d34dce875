"""Streaming-session tests (modeled on reference tests/streaming.rs)."""

import io

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, SeaDecoder, SeaEncoder, sea_decode, sea_encode
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


class SharedBuffer:
    """A pipe: writes append, reads drain from the front (streaming.rs:18-49)."""

    def __init__(self):
        self._buf = bytearray()

    def write(self, data: bytes) -> int:
        self._buf += data
        return len(data)

    def read(self, n: int) -> bytes:
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def flush(self):
        pass


@pytest.mark.parametrize("vbr", [False, True])
def test_streaming_matches_batch(vbr):
    """Interleaved chunk-by-chunk decode == batch round trip (streaming.rs:51-97)."""
    channels = 2
    settings = EncoderSettings(frames_per_chunk=1000, residual_bits=2.5 if vbr else 3.0, vbr=vbr)
    samples = gen_test_signal(channels, 50017)
    frames = samples.shape[0] // channels
    samples = samples[: frames * channels]

    batch = sea_decode(sea_encode(samples, TEST_SAMPLE_RATE, channels, settings))

    pipe = SharedBuffer()
    out = io.BytesIO()
    reader = io.BytesIO(samples.astype("<i2").tobytes())
    enc = SeaEncoder(channels, TEST_SAMPLE_RATE, None, settings, reader, pipe)

    # First encode_frame writes header + first chunk; then attach decoder.
    assert enc.encode_frame()
    dec = SeaDecoder(pipe, out)

    more = True
    while more:
        more = enc.encode_frame()
        dec.decode_frame()
    enc.finalize()
    # Streaming mode cannot parse a short final chunk (reference behavior);
    # drain whatever full chunks remain.
    while True:
        try:
            if not dec.decode_frame():
                break
        except Exception:
            break

    streamed = np.frombuffer(out.getvalue(), dtype="<i2")
    assert streamed.size > 0
    np.testing.assert_array_equal(streamed, np.asarray(batch.samples)[: streamed.size])


def test_streaming_header_has_zero_total_frames():
    pipe = SharedBuffer()
    samples = gen_test_signal(1, 3000)
    reader = io.BytesIO(samples.astype("<i2").tobytes())
    enc = SeaEncoder(1, TEST_SAMPLE_RATE, None, EncoderSettings(frames_per_chunk=1000), reader, pipe)
    while enc.encode_frame():
        pass
    data = pipe.read(10**9)
    assert data[0:4] == b"seac"
    assert int.from_bytes(data[14:18], "little") == 0  # total_frames


def test_explicit_streaming_mode_writes_header_upfront():
    """total_frames == 0 -> header (chunk_size 0) before any chunk."""
    pipe = SharedBuffer()
    reader = io.BytesIO(b"")
    SeaEncoder(1, TEST_SAMPLE_RATE, 0, EncoderSettings(), reader, pipe)
    data = pipe.read(10**9)
    assert data[0:4] == b"seac"
    assert int.from_bytes(data[6:8], "little") == 0  # chunk_size unknown


@pytest.mark.parametrize("vbr", [False, True])
def test_session_seek_bit_exact(vbr):
    """SeaDecoder.seek jumps to any chunk in O(1) and resumes bit-exactly
    (the format's fixed-chunk-size design goal, reference README.md:88;
    upstream only *plans* session seeking, README.md:125)."""
    channels = 2
    settings = EncoderSettings(
        frames_per_chunk=500, residual_bits=2.5 if vbr else 3.0, vbr=vbr
    )
    samples = gen_test_signal(channels, 7003 * channels)
    frames = samples.shape[0] // channels
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    full = np.asarray(sea_decode(encoded).samples)

    for target in (0, 500, 1234, 6999, frames):  # aligned, mid-chunk, tail, EOF
        out = io.BytesIO()
        dec = SeaDecoder(io.BytesIO(encoded), out)
        pos = dec.seek(target)
        assert pos == (target // 500) * 500
        while dec.decode_frame():
            pass
        got = np.frombuffer(out.getvalue(), dtype="<i2")
        np.testing.assert_array_equal(got, full[pos * channels :])


def test_session_seek_rejects_bad_targets():
    from sea_codec_tpu import SeaError

    samples = gen_test_signal(1, 3000)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, EncoderSettings(frames_per_chunk=1000))
    dec = SeaDecoder(io.BytesIO(encoded), io.BytesIO())
    with pytest.raises(SeaError):
        dec.seek(-1)
    with pytest.raises(SeaError):
        dec.seek(samples.shape[0] + 1)
    # non-seekable pipe readers refuse loudly instead of corrupting state
    pipe = SharedBuffer()
    pipe.write(encoded)
    dec2 = SeaDecoder(pipe, io.BytesIO())
    with pytest.raises(SeaError):
        dec2.seek(0)

    # a reader whose tell() works but whose seek() raises still surfaces the
    # documented SeaError, not the reader's raw exception
    class TellOnly(io.BytesIO):
        def seek(self, *a, **k):
            raise OSError("backward seek unsupported")

    dec3 = SeaDecoder(TellOnly(encoded), io.BytesIO())
    with pytest.raises(SeaError, match="seekable"):
        dec3.seek(0)
