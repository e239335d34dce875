"""Device-side CBR row parsing and on-device transcode (parse_device.py)."""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.batch import parse_full_chunks, split_chunks
from sea_codec_tpu.ops.parse_device import (
    parse_chunks_cbr_device,
    transcode_chunks_cbr_device,
)
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def _rows(channels, n_chunks, fpc=200, sff=20, rs=3, sfb=4):
    frames = n_chunks * fpc
    sig = varied_signal(channels, frames, seed=91)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff,
        residual_bits=float(rs), scale_factor_bits=sfb,
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, tail = split_chunks(encoded)
    assert not tail and rect.shape[0] == n_chunks
    return sig, encoded, header, rect


@pytest.mark.parametrize("channels,rs,sfb", [(1, 3, 4), (2, 3, 4), (2, 1, 3), (3, 8, 5)])
def test_parse_matches_host_parser(channels, rs, sfb):
    sig, _enc, header, rect = _rows(channels, 4, rs=rs, sfb=sfb)
    fpc, sff = header.frames_per_chunk, 20
    want = parse_full_chunks(rect, header)
    res, sf, rs_a, hist, wts = (
        np.asarray(a)
        for a in parse_chunks_cbr_device(
            rect, channels, scale_factor_bits=sfb, scale_factor_frames=sff,
            residual_size=rs, frames=fpc,
        )
    )
    np.testing.assert_array_equal(sf, want.sf)
    np.testing.assert_array_equal(rs_a, want.rs)
    np.testing.assert_array_equal(hist, want.hist)
    np.testing.assert_array_equal(wts, want.wts)
    np.testing.assert_array_equal(res[:, : want.res_bytes.shape[1]], want.res_bytes)


@pytest.mark.parametrize("channels", [1, 2])
def test_transcode_device_matches_decode(channels):
    """decode(parse(rows)) on device == the one-shot API's PCM."""
    sig, encoded, header, rect = _rows(channels, 4)
    out = np.asarray(
        transcode_chunks_cbr_device(
            rect, channels, scale_factor_bits=4, scale_factor_frames=20,
            residual_size=3, frames=header.frames_per_chunk,
        )
    )
    want = np.asarray(sea_decode(encoded).samples).reshape(
        -1, header.frames_per_chunk, channels
    )
    np.testing.assert_array_equal(out, want)


def test_transcode_device_from_device_encoded_rows():
    """Full device pipeline: encode blocks -> serialized rows -> parse ->
    decode, PCM identical to the host round trip (bytes never reparsed on
    host)."""
    import jax.numpy as jnp

    from sea_codec_tpu.ops import lms as lms_ops
    from sea_codec_tpu.ops.encode_file import encode_corpus_cbr_packed_blocks

    channels, fpc, sff, rs = 2, 200, 20, 3
    nf, nc = 4, 3
    files = [varied_signal(channels, nc * fpc, seed=100 + i) for i in range(nf)]
    b = nf * channels
    # lanes are file-major, channel-minor (lane = file * C + ch)
    x = np.stack(
        [f.reshape(nc, fpc, channels) for f in files], axis=2
    ).reshape(nc, fpc, b)[None]
    frames_lane = np.full((1, b), nc * fpc, np.int32)
    tail_idx = np.full((1, nf), nc, np.int32)
    h0 = np.broadcast_to(
        np.tile(lms_ops.initial_history(channels), (nf, 1)), (1, b, 4))
    w0 = np.broadcast_to(
        np.tile(lms_ops.initial_weights(channels), (nf, 1)), (1, b, 4))
    p0 = np.zeros((1, b), np.int32)

    out = encode_corpus_cbr_packed_blocks(
        jnp.asarray(x), frames_lane, tail_idx, h0, w0, p0,
        scale_factor_frames=sff, scale_factor_bits=4, residual_size=rs,
        n_files=nf, use_pallas=False,
    )
    rows = np.asarray(out[0])[0]  # [nf, nc, chunk_size]
    pcm = np.asarray(
        transcode_chunks_cbr_device(
            jnp.asarray(rows.reshape(nf * nc, -1)), channels,
            scale_factor_bits=4, scale_factor_frames=sff,
            residual_size=rs, frames=fpc,
        )
    ).reshape(nf, nc * fpc * channels)

    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff, residual_bits=float(rs)
    )
    for i, f in enumerate(files):
        want = sea_decode(sea_encode(f, TEST_SAMPLE_RATE, channels, st)).samples
        np.testing.assert_array_equal(pcm[i], np.asarray(want))


@pytest.mark.parametrize("channels,target", [(1, 2.5), (2, 2.5), (2, 5.0)])
def test_vbr_parse_and_decode_rows(channels, target):
    """VBR rows parse on device identically to the host parser, and
    decode_rows_vbr_device's PCM matches the one-shot API."""
    from sea_codec_tpu.ops.parse_device import (
        decode_rows_vbr_device,
        parse_chunks_vbr_device,
    )

    fpc, sff = 200, 20
    frames = 4 * fpc
    sig = varied_signal(channels, frames, seed=92)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff,
        residual_bits=target, vbr=True,
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, tail = split_chunks(encoded)
    assert not tail and rect.shape[0] == 4
    base = int(target)

    want = parse_full_chunks(rect, header)
    res, sf, rs_a, hist, wts = (
        np.asarray(a)
        for a in parse_chunks_vbr_device(
            rect, channels, scale_factor_bits=4, scale_factor_frames=sff,
            residual_size=base, frames=fpc,
        )
    )
    np.testing.assert_array_equal(sf, want.sf)
    np.testing.assert_array_equal(rs_a, want.rs)
    np.testing.assert_array_equal(hist, want.hist)
    np.testing.assert_array_equal(wts, want.wts)
    np.testing.assert_array_equal(res[:, : want.res_bytes.shape[1]], want.res_bytes)

    out = np.asarray(
        decode_rows_vbr_device(
            rect, channels, scale_factor_bits=4, scale_factor_frames=sff,
            residual_size=base, frames=fpc, max_code_bits=min(8, base + 2),
        )
    )
    want_pcm = np.asarray(sea_decode(encoded).samples).reshape(-1, fpc, channels)
    np.testing.assert_array_equal(out, want_pcm)
