"""Bit-exactness tests against the upstream C decoder (golden oracle).

Skipped when the reference checkout (or a C compiler) is unavailable.
"""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.ops import tables
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

from oracle import get_oracle, oracle_decode, oracle_dqt

pytestmark = pytest.mark.skipif(get_oracle() is None, reason="C oracle unavailable")


@pytest.mark.parametrize("scale_factor_bits", [3, 4, 5])
@pytest.mark.parametrize("residual_bits", list(range(1, 9)))
def test_dqt_tables_match_oracle(scale_factor_bits, residual_bits):
    ours = tables.dqt(residual_bits, scale_factor_bits)
    theirs = oracle_dqt(scale_factor_bits, residual_bits)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("channels", [1, 2, 3, 8])
@pytest.mark.parametrize("residual_bits", [1, 3, 8])
def test_cbr_roundtrip_matches_oracle(channels, residual_bits):
    samples = gen_test_signal(channels, 12345)
    frames = samples.shape[0] // channels
    samples = samples[: frames * channels]
    settings = EncoderSettings(residual_bits=float(residual_bits))
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)

    golden, rate, ch = oracle_decode(encoded)
    assert rate == TEST_SAMPLE_RATE and ch == channels

    ours = sea_decode(encoded)
    np.testing.assert_array_equal(np.asarray(ours.samples), golden)


def test_cbr_sweep_configs_match_oracle():
    samples = gen_test_signal(2, 30000)
    for sfb in (3, 4, 5):
        for sff in (5, 20, 64):
            settings = EncoderSettings(
                scale_factor_bits=sfb,
                scale_factor_frames=sff,
                residual_bits=4.0,
                frames_per_chunk=5120,
            )
            encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, settings)
            golden, _, _ = oracle_decode(encoded)
            ours = sea_decode(encoded)
            np.testing.assert_array_equal(np.asarray(ours.samples), golden)
