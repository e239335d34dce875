"""AOT decoder export (sea_codec_tpu.aot): serialize, reload, bit-identity."""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.aot import export_rows_decoder, load_rows_decoder
from sea_codec_tpu.batch import split_chunks
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def _stream(channels, vbr, target, fpc=200, n_chunks=4):
    sig = varied_signal(channels, n_chunks * fpc, seed=77)
    st = EncoderSettings(frames_per_chunk=fpc, residual_bits=target, vbr=vbr)
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, tail = split_chunks(encoded)
    assert not tail
    return encoded, header, rect


@pytest.mark.parametrize("channels,vbr,target", [(2, False, 3.0), (1, False, 1.0), (2, True, 2.5)])
def test_export_reload_roundtrip(channels, vbr, target):
    encoded, header, rect = _stream(channels, vbr, target)
    blob = export_rows_decoder(
        n_chunks=rect.shape[0],
        channels=channels,
        frames_per_chunk=header.frames_per_chunk,
        residual_size=int(target),
        vbr=vbr,
        max_code_bits=min(8, int(target) + 2),
        chunk_size=header.chunk_size if vbr else None,
    )
    assert isinstance(blob, bytes) and len(blob) > 1000

    decode = load_rows_decoder(blob)
    out = np.asarray(decode(rect))
    want = np.asarray(sea_decode(encoded).samples).reshape(
        rect.shape[0], header.frames_per_chunk, channels
    )
    np.testing.assert_array_equal(out, want)


def test_vbr_export_requires_chunk_size():
    with pytest.raises(ValueError, match="chunk_size"):
        export_rows_decoder(n_chunks=4, channels=2, vbr=True)
