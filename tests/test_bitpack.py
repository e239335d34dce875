"""Unit tests for bit packing/unpacking against a scalar reference model."""

import numpy as np
import pytest

from sea_codec_tpu.ops import bitpack


def scalar_pack(values, widths):
    """Direct transcription of BitPacker semantics (bits.rs:104-134)."""
    accum = 0
    stored = 0
    out = []
    for v, w in zip(values, widths):
        mask = (1 << w) - 1
        accum = (accum << w) | (int(v) & mask)
        stored += w
        if stored >= 8:
            out.append((accum >> (stored - 8)) & 0xFF)
            stored -= 8
            accum &= (1 << stored) - 1
    if stored > 0:
        out.append((accum << (8 - stored)) & 0xFF)
    return np.array(out, dtype=np.uint8)


def scalar_unpack(data, widths):
    """Direct transcription of BitUnpacker semantics (bits.rs:34-69)."""
    out = []
    stored = 0
    carry = 0
    i = 0
    for byte in data:
        value = (carry << 8) | int(byte)
        stored += 8
        while i < len(widths) and stored >= widths[i]:
            bits = widths[i]
            out.append((value >> (stored - bits)) & ((1 << bits) - 1))
            stored -= bits
            i += 1
        carry = value & ((1 << stored) - 1)
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("width", list(range(1, 9)))
def test_const_width_roundtrip(width):
    rng = np.random.default_rng(width)
    values = rng.integers(0, 1 << width, size=1001).astype(np.uint32)
    packed = bitpack.pack_bits(values, width)
    expected = scalar_pack(values, [width] * len(values))
    np.testing.assert_array_equal(packed, expected)

    unpacked = bitpack.unpack_bits(packed, width, count=len(values))
    np.testing.assert_array_equal(unpacked, values.astype(np.uint8))


def test_variable_width_roundtrip():
    rng = np.random.default_rng(7)
    widths = rng.integers(1, 9, size=997)
    values = np.array([rng.integers(0, 1 << w) for w in widths], dtype=np.uint32)
    packed = bitpack.pack_bits(values, widths)
    expected = scalar_pack(values, widths)
    np.testing.assert_array_equal(packed, expected)

    unpacked = bitpack.unpack_bits(packed, widths)
    np.testing.assert_array_equal(unpacked, values.astype(np.uint8))
    # scalar unpack agrees too
    np.testing.assert_array_equal(scalar_unpack(packed, widths), values.astype(np.uint8))


def test_const_width_greedy_extraction():
    """Constant-width unpack yields floor(total_bits / w) items (bits.rs:42)."""
    data = np.array([0b10110011, 0b01010101], dtype=np.uint8)
    out = bitpack.unpack_bits(data, 3)
    assert out.shape[0] == 5
    np.testing.assert_array_equal(out, [0b101, 0b100, 0b110, 0b101, 0b010])


def test_empty():
    assert bitpack.pack_bits(np.zeros(0, np.uint32), 4).shape == (0,)
    assert bitpack.unpack_bits(np.zeros(0, np.uint8), 4).shape == (0,)


def test_final_partial_byte_left_aligned():
    # one 3-bit value -> byte 0bvvv00000
    packed = bitpack.pack_bits(np.array([0b101], dtype=np.uint32), 3)
    np.testing.assert_array_equal(packed, [0b10100000])


@pytest.mark.parametrize("width", list(range(1, 9)))
def test_pack_bits_rows_matches_scalar(width):
    rng = np.random.default_rng(width + 100)
    vals = rng.integers(0, 1 << width, size=(7, 203)).astype(np.uint32)
    rows = bitpack.pack_bits_rows(vals, width)
    for i in range(vals.shape[0]):
        np.testing.assert_array_equal(rows[i], bitpack.pack_bits(vals[i], width))


def test_pack_bits_rows_variable_widths():
    rng = np.random.default_rng(9)
    n, count = 5, 240
    base = rng.integers(1, 7, size=count)
    # per-row permutations of the same width multiset -> equal totals
    widths = np.stack([rng.permutation(base) for _ in range(n)])
    vals = (rng.integers(0, 256, size=(n, count)) & ((1 << widths) - 1)).astype(np.uint32)
    rows = bitpack.pack_bits_rows(vals, widths)
    for i in range(n):
        np.testing.assert_array_equal(rows[i], bitpack.pack_bits(vals[i], widths[i]))


@pytest.mark.parametrize("width", list(range(1, 9)))
def test_pack_bits_rows_device_matches_scalar(width):
    """The device packer's closed-form periodic shift/or combination is
    bit-identical to the scalar packer (reference bits.rs:104-134),
    including ragged final bytes (left-aligned padding)."""
    import jax.numpy as jnp

    from sea_codec_tpu.ops.serialize_device import pack_bits_rows_device

    rng = np.random.default_rng(width + 200)
    for n in (1, 7, 8, 203, 1024):
        vals = rng.integers(0, 1 << width, size=(4, n)).astype(np.uint32)
        got = np.asarray(pack_bits_rows_device(jnp.asarray(vals), width))
        want = np.stack([bitpack.pack_bits(v, width) for v in vals])
        np.testing.assert_array_equal(got, want)


def test_unpack_too_short_raises():
    """Both unpack surfaces reject a bitstream with fewer bits than the
    requested items as SeaInvalidFrame (reference returns a Result error,
    src/codec/bits.rs unpack bounds), never a raw IndexError -- this guards
    the constant-width fast paths' explicit bounds checks."""
    from sea_codec_tpu.utils.errors import SeaInvalidFrame

    data = np.zeros(3, dtype=np.uint8)  # 24 bits
    with pytest.raises(SeaInvalidFrame):
        bitpack.unpack_bits(data, 5, count=5)  # needs 25
    with pytest.raises(SeaInvalidFrame):
        bitpack.unpack_bits(data, np.array([8, 8, 8, 8], dtype=np.int64))
    with pytest.raises(SeaInvalidFrame):
        bitpack.unpack_bits_rows(data[None, :], 5, count=5)
    # exact fit still succeeds on every surface
    assert bitpack.unpack_bits(data, 8, count=3).shape == (3,)
    assert bitpack.unpack_bits_rows(data[None, :], 8, count=3).shape == (1, 3)
