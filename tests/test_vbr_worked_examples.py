"""Hand-derived VBR worked-example vectors (reference source-text oracle).

Every other VBR byte check in this suite is same-author agreement (the
JAX, C++, and JS engines are pinned byte-identical to each other, and the
decoder accepts reference-anchored streams) -- a shared misreading of the
Rust would be invisible to all of them. The expected values in THIS module
were derived by hand from reading the reference source
(``src/codec/encoder_vbr.rs:40-137``, ``src/codec/chunk.rs:245-278``,
``src/codec/bits.rs:104-134``), NOT by running any implementation in this
repo; each test's derivation is written out in its comments. The C++ and
JS engines are covered transitively: they are asserted byte-identical to
the Python model on full encodes elsewhere in the suite, and the Python
model is pinned to these hand values here.

f32 robustness: every truncating cast below sits >= 0.1 away from an
integer boundary under exact decimal arithmetic, and the f32 chains
reproduce the decimal values to ~1e-7, so no ulp-level difference between
a hand decimal derivation and Rust's f32 evaluation can flip any count.
"""

import numpy as np
import pytest

from sea_codec_tpu.container import CHUNK_TYPE_VBR, SeaChunk
from sea_codec_tpu.models.vbr import (
    VbrEncoderModel,
    interpolate_distribution,
    normalized_vbr_bitrate,
)


def test_normalized_bitrate_hand_values():
    """encoder_vbr.rs:40-63. vbr = rb - 128/fpc - sfb/sff - 2/sff - diff,
    where diff = (0.95*floor(rb) + 0.05*(floor(rb)+1)) - floor(rb) = 0.05.

    A: 3.0 - 128/640 - 4/20 - 2/20 - 0.05 = 3.0-0.2-0.2-0.1-0.05 = 2.45
    B: 2.9 - 128/512 - 4/5  - 2/5  - 0.05 = 2.9-0.25-0.8-0.4-0.05 = 1.40
    C: 3.0 - 128/2560 - 3/25 - 2/25 - 0.05 = 3.0-0.05-0.12-0.08-0.05 = 2.70
    """
    assert float(normalized_vbr_bitrate(3.0, 640, 4, 20)) == pytest.approx(
        2.45, abs=2e-6
    )
    assert float(normalized_vbr_bitrate(2.9, 512, 4, 5)) == pytest.approx(
        1.40, abs=2e-6
    )
    assert float(normalized_vbr_bitrate(3.0, 2560, 3, 25)) == pytest.approx(
        2.70, abs=2e-6
    )


def test_interpolate_distribution_hand_values():
    """encoder_vbr.rs:66-96 with D = [0, 0, 0.95, 0.05, 0, 0]:
    percentages = [0, 0.95*(1-frac), 0.95*frac + 0.05*(1-frac), 0.05*frac];
    per while-pass, value_i = trunc(remaining * p_i); a pass with no
    progress dumps the remainder into the target bucket (res[1]).

    items=32, target=2.45 (frac .45): p = [0, .5225, .455, .0225]
      pass1 rem=32: [0, trunc(16.72)=16, trunc(14.56)=14, trunc(.72)=0] sum 30
      pass2 rem=2:  [0, trunc(1.045)=1,  trunc(.91)=0,   0]            sum 31
      pass3 rem=1:  all 0 -> stall -> res[1] += 1
      => (0, 18, 14, 0)
    items=9, target=1.40 (frac .40): p = [0, .57, .41, .02]
      pass1 rem=9: [0, trunc(5.13)=5, trunc(3.69)=3, trunc(.18)=0] sum 8
      pass2 rem=1: all 0 -> stall -> res[1] += 1
      => (0, 6, 3, 0)
    items=40, target=2.70 (frac .70): p = [0, .285, .68, .035]
      pass1 rem=40: [0, trunc(11.4)=11, trunc(27.2)=27, trunc(1.4)=1] sum 39
      pass2 rem=1:  all 0 -> stall -> res[1] += 1
      => (0, 12, 27, 1)
    """
    f = np.float32
    assert interpolate_distribution(32, f(2.45)) == (0, 18, 14, 0)
    assert interpolate_distribution(9, f(1.40)) == (0, 6, 3, 0)
    assert interpolate_distribution(40, f(2.70)) == (0, 12, 27, 1)


def test_chooser_example_a_scrambled_ranks():
    """encoder_vbr.rs:98-137, config A (c=1, sfb=4, sff=20, fpc=640,
    rb=3.0, 640 frames): sortable = 640/20 = 32, base = trunc(2.45) = 2,
    counts (0, 18, 14, 0) from the distribution test above -> the 14
    highest-error windows get base+1 = 3, the rest keep 2.

    errors[i] = ((7*i) mod 32) * 100 -- a permutation, so ranks are unique
    (no ties) and rank(i) = (7*i) mod 32. The 14 highest ranks are values
    18..31, i.e. exactly i in {3,4,8,9,12,13,17,18,21,22,26,27,30,31}.
    """
    m = VbrEncoderModel(1, 4, 20, 3.0, 640)
    errors = np.array([((7 * i) % 32) * 100 for i in range(32)], dtype=np.uint64)
    sizes = m._choose_residual_sizes(640, errors)
    want = np.full(32, 2, dtype=np.uint8)
    want[[3, 4, 8, 9, 12, 13, 17, 18, 21, 22, 26, 27, 30, 31]] = 3
    np.testing.assert_array_equal(sizes, want)


def test_chooser_example_b_partial_window_quirk():
    """Config B (c=2, sfb=4, sff=5, fpc=512, rb=2.9) on a 23-frame chunk:
    5 windows (last has 3 frames) x 2 channels = 10 error slots, and
    sortable_items = input_len / sff = 46/5 = 9 -- floor over SAMPLES, not
    whole windows (encoder_vbr.rs:100): slot 8 (partial window, channel 0)
    IS sortable, slot 9 (partial window, channel 1) is protected at base.
    base = trunc(1.40) = 1; counts (0, 6, 3, 0) -> top-3 of the 9 sortable
    get base+1 = 2.

    errors = [10..80, 1000, 999999]: ranks of the first 9 are ascending by
    index, top-3 = slots 6, 7, 8 -> size 2. Slot 9 keeps size 1 despite
    holding the largest raw error -- pinning both the quirk (slot 8
    promoted) and the protection (slot 9 untouched).
    """
    m = VbrEncoderModel(2, 4, 5, 2.9, 512)
    errors = np.array(
        [10, 20, 30, 40, 50, 60, 70, 80, 1000, 999999], dtype=np.uint64
    )
    sizes = m._choose_residual_sizes(46, errors)
    np.testing.assert_array_equal(
        sizes, np.array([1, 1, 1, 1, 1, 1, 2, 2, 2, 1], dtype=np.uint8)
    )


def test_chooser_example_c_plus_two_anchor_extreme():
    """Config C (c=1, sfb=3, sff=25, fpc=2560, rb=3.0) on a 1000-frame
    chunk: sortable = 1000/25 = 40, base = trunc(2.70) = 2, counts
    (0, 12, 27, 1) -> ranks 12..38 get 3 and rank 39 gets base+2 = 4, the
    delta-anchor extreme (stored as the 2-bit delta 4 - 2 + 1 = 3,
    chunk.rs:248-249).

    errors[i] = i*i: strictly increasing, ranks = indices.
    """
    m = VbrEncoderModel(1, 3, 25, 3.0, 2560)
    errors = (np.arange(40, dtype=np.uint64)) ** 2
    sizes = m._choose_residual_sizes(1000, errors)
    want = np.full(40, 2, dtype=np.uint8)
    want[12:39] = 3
    want[39] = 4
    np.testing.assert_array_equal(sizes, want)


def test_chooser_example_e_tied_ranks():
    """Config A with ties straddling the promote boundary: 17 slots at
    error 100 and 15 slots at error 200, top-14 promoted. Rust sorts with
    sort_unstable_by (encoder_vbr.rs:103), which leaves tie order
    UNSPECIFIED -- but every 200 outranks every 100, so the Rust-derivable
    invariants are: exactly 14 promotions, all from the 200 group, exactly
    one 200 slot left behind. This implementation's documented divergence
    (models/vbr.py module docstring) is a STABLE sort: ties keep index
    order, so the lowest-indexed 200 is deterministically the one left at
    base.
    """
    m = VbrEncoderModel(1, 4, 20, 3.0, 640)
    i200 = np.array([1, 4, 5, 9, 10, 11, 14, 17, 20, 22, 25, 27, 28, 30, 31])
    errors = np.full(32, 100, dtype=np.uint64)
    errors[i200] = 200
    sizes = m._choose_residual_sizes(640, errors)
    # Rust-derivable invariants (any conforming tie-break):
    assert int((sizes == 3).sum()) == 14
    assert set(np.flatnonzero(sizes == 3)).issubset(set(i200.tolist()))
    # our documented stable tie-break: min(i200) is the one left at base
    want = np.full(32, 2, dtype=np.uint8)
    want[i200] = 3
    want[i200.min()] = 2
    np.testing.assert_array_equal(sizes, want)


def test_vbr_section_bytes_mono():
    """Section bytes by hand, c=1, sff=5, 10 frames (2 windows), anchor
    residual_size=2, sizes [2, 3], sf_bits=4, scale factors [9, 4].

    header (chunk.rs:215-226): [type, (4<<4)|2, 5, 0x5A]
    sf section: 1001 0100 -> 0x94
    size deltas (chunk.rs:245-252): size-2+1 = [1, 2] -> 01 10 pad -> 0x60
    residuals (chunk.rs:254-278): window0 codes [1,2,3,0,1] @2 bits,
    window1 codes [5,7,0,3,6] @3 bits, MSB-first (bits.rs:104-134):
      "01 10 11 00 01" + "101 111 000 011 110"
      = 01101100 01101111 00001111 0last-bit-left-aligned
      -> 0x6C 0x6F 0x0F 0x00
    """
    ch = SeaChunk(
        channels=1,
        frames_in_chunk=10,
        chunk_type=CHUNK_TYPE_VBR,
        scale_factor_bits=4,
        scale_factor_frames=5,
        residual_size=2,
        lms_history=np.zeros((1, 4), np.int32),
        lms_weights=np.zeros((1, 4), np.int32),
        scale_factors=np.array([9, 4], np.uint8),
        vbr_residual_sizes=np.array([2, 3], np.uint8),
        residuals=np.array([1, 2, 3, 0, 1, 5, 7, 0, 3, 6], np.uint8),
    )
    got = ch.serialize()
    assert got[:4] == bytes([CHUNK_TYPE_VBR, 0x42, 5, 0x5A])
    # 16 zero LMS bytes, then sf, deltas, residuals
    assert got[4:20] == bytes(16)
    assert got[20:] == bytes([0x94, 0x60, 0x6C, 0x6F, 0x0F, 0x00])


def test_vbr_section_bytes_stereo_interleave():
    """Per-frame channel interleaving with per-(window, channel) widths
    (chunk.rs:258-270: vbr_residual_index advances only every
    scale_factor_frames frames). c=2, sff=2, 4 frames, anchor 2,
    sizes [[1,2],[3,1]] (window-major, channel-minor).

    size deltas: s-2+1 = [0,1,2,0] -> 00 01 10 00 -> 0x18
    residual codes, frame-major channel-minor with widths
    f0:(1@1,3@2) f1:(0@1,2@2) f2:(5@3,1@1) f3:(7@3,0@1):
      "1 11 0 10 101 1 111 0" = 11101010 111110 + pad -> 0xEA 0xF8
    scale factors [1,2,3,4] @4 bits -> 0x12 0x34
    """
    ch = SeaChunk(
        channels=2,
        frames_in_chunk=4,
        chunk_type=CHUNK_TYPE_VBR,
        scale_factor_bits=4,
        scale_factor_frames=2,
        residual_size=2,
        lms_history=np.zeros((2, 4), np.int32),
        lms_weights=np.zeros((2, 4), np.int32),
        scale_factors=np.array([1, 2, 3, 4], np.uint8),
        vbr_residual_sizes=np.array([1, 2, 3, 1], np.uint8),
        residuals=np.array([1, 3, 0, 2, 5, 1, 7, 0], np.uint8),
    )
    got = ch.serialize()
    assert got[:4] == bytes([CHUNK_TYPE_VBR, 0x42, 2, 0x5A])
    assert got[36:] == bytes([0x12, 0x34, 0x18, 0xEA, 0xF8])
