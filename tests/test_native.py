"""Cross-validation: the independent C++ scalar codec vs the JAX pipeline.

Two independently-written implementations of the same semantics agreeing
bit-for-bit on random inputs is the strongest available evidence of
correctness (the Rust reference cannot be built in this environment; its C
decoder oracle covers CBR decode only -- this covers encode and VBR too).
"""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.native import (
    available,
    native_decode,
    native_dump_dqt,
    native_dump_reciprocals,
    native_encode,
)
from sea_codec_tpu.ops import tables
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

pytestmark = pytest.mark.skipif(not available(), reason="no C++ compiler")


@pytest.mark.parametrize("sfb", [3, 4, 5])
@pytest.mark.parametrize("rb", list(range(1, 9)))
def test_tables_match_native(sfb, rb):
    np.testing.assert_array_equal(tables.dqt(rb, sfb), native_dump_dqt(sfb, rb))
    np.testing.assert_array_equal(
        tables.reciprocals(rb, sfb), native_dump_reciprocals(sfb, rb)
    )


@pytest.mark.parametrize("vbr", [False, True])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_encode_bytes_match_native(vbr, channels):
    """JAX encoder output is byte-identical to the independent C++ encoder."""
    samples = gen_test_signal(channels, 13000)
    n = samples.shape[0] // channels
    samples = samples[: n * channels]
    settings = EncoderSettings(
        frames_per_chunk=1000, residual_bits=2.5 if vbr else 3.0, vbr=vbr
    )
    ours = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    theirs = native_encode(
        samples,
        TEST_SAMPLE_RATE,
        channels,
        scale_factor_bits=settings.scale_factor_bits,
        scale_factor_frames=settings.scale_factor_frames,
        residual_bits=settings.residual_bits,
        frames_per_chunk=settings.frames_per_chunk,
        vbr=vbr,
    )
    assert ours == theirs


@pytest.mark.parametrize("vbr", [False, True])
def test_decode_matches_native(vbr):
    samples = gen_test_signal(2, 20000)
    settings = EncoderSettings(residual_bits=2.5 if vbr else 3.0, vbr=vbr)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, settings)
    ours = np.asarray(sea_decode(encoded).samples)
    theirs, rate, ch = native_decode(encoded)
    assert (rate, ch) == (TEST_SAMPLE_RATE, 2)
    np.testing.assert_array_equal(ours, theirs)


def test_native_roundtrip_configs():
    rng = np.random.default_rng(11)
    for sfb in (3, 4, 5):
        for rb in (1.0, 4.0, 8.0):
            samples = (rng.standard_normal(6000) * 8000).astype(np.int16)
            enc = native_encode(
                samples, 44100, 1, scale_factor_bits=sfb, residual_bits=rb,
                frames_per_chunk=1000,
            )
            ours = sea_encode(
                samples,
                44100,
                1,
                EncoderSettings(
                    scale_factor_bits=sfb, residual_bits=rb, frames_per_chunk=1000
                ),
            )
            assert enc == ours


def test_native_decode_rejects_corrupt_config_bytes():
    """Hardening: corrupted chunk-config bytes (incl. sfb=0, the round-1
    advisor's segfault repro) must return a clean error, never crash."""
    samples = gen_test_signal(1, 3000)
    valid = sea_encode(
        samples, TEST_SAMPLE_RATE, 1, EncoderSettings(frames_per_chunk=1000)
    )
    rng = np.random.default_rng(7)
    cases = []
    # chunk config byte: (sfb << 4) | residual_size.  0x01 = sfb 0 (OOB DQT
    # read in the unguarded decoder), 0x00/0x0F/0xF0/0xFF sweep both nibbles.
    for byte_val in (0x01, 0x00, 0x0F, 0xF0, 0xFF, 0x91, 0x19):
        b = bytearray(valid)
        b[22 + 1] = byte_val
        cases.append(bytes(b))
    b = bytearray(valid)
    b[22 + 2] = 0  # zero scale_factor_frames
    cases.append(bytes(b))
    for _ in range(20):
        b = bytearray(valid)
        for _ in range(6):
            b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        cases.append(bytes(b))
    for data in cases:
        try:
            native_decode(data)
        except ValueError:
            pass  # rejected cleanly


def test_native_pack_rows_matches_bitpack():
    """The C++ row packer must be bit-identical to ops.bitpack for constant
    and per-item widths (it serves the VBR serializer hot path)."""
    from sea_codec_tpu.native import native_pack_rows
    from sea_codec_tpu.ops import bitpack

    rng = np.random.default_rng(5)
    for n, count in ((1, 1), (7, 13), (65, 399), (200, 1024)):
        w = int(rng.integers(1, 9))
        vals = rng.integers(0, 1 << w, size=(n, count)).astype(np.uint8)
        want = bitpack.pack_bits_rows(vals, w)
        np.testing.assert_array_equal(
            native_pack_rows(vals, w, want.shape[1]), want
        )
        wd = np.repeat(rng.integers(1, 9, size=(1, count)).astype(np.uint8), n, axis=0)
        vals = (
            rng.integers(0, 256, size=(n, count)) % (1 << wd.astype(np.int64))
        ).astype(np.uint8)
        want = bitpack.pack_bits_rows(vals, wd)
        np.testing.assert_array_equal(
            native_pack_rows(vals, wd, want.shape[1]), want
        )


def test_native_decode_header_bounds():
    """Regression (fuzzing): a corrupt total_frames or metadata_size header
    field must not drive the probe-sized allocation (observed: multi-TB
    np.zeros) or wrap the chunk-region arithmetic past EOF."""
    samples = gen_test_signal(1, 3000)
    valid = sea_encode(
        samples, TEST_SAMPLE_RATE, 1, EncoderSettings(frames_per_chunk=1000)
    )
    # total_frames (offset 14..17) -> u32 max: probe must clamp to the bytes
    # actually present, so the decode either truncates gracefully or rejects
    b = bytearray(valid)
    b[14:18] = (0xFFFFFFFF).to_bytes(4, "little")
    try:
        out, _, _ = native_decode(bytes(b))
        assert out.shape[0] <= len(valid) * 8  # format bound, not TB-scale
    except ValueError:
        pass
    # metadata_size (offset 18..21) past EOF: size_t (len - pos) would wrap
    b = bytearray(valid)
    b[18:22] = (0xFFFFFF00).to_bytes(4, "little")
    with pytest.raises(ValueError):
        native_decode(bytes(b))
