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
