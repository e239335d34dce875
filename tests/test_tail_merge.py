"""Merged ragged-tail decode: tails ride ``decode_chunks_packed``.

``decode_corpus`` repacks each ragged tail chunk into a full-chunk packed
row (residual section zero-padded to the group byte width, sf/rs padded
with suffix windows) and decodes it through the SAME program as the full
chunks -- no separate tail decode program exists anymore. These tests
assert bit-exactness of the real prefix against the one-shot decoder on
every kernel path (XLA windowed, fused Pallas CBR, fused Pallas VBR with
the MXU neighborhood fetch), plus the natural-width groups that tail-only
files create. Ragged-tail semantics: reference
``src/codec/chunk.rs:76-79,105-106``.
"""

from conftest import pallas_interpret
import jax.numpy as jnp
import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu import batch
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.bitpack import packed_byte_len
from sea_codec_tpu.ops.device_decode import batch_max_code_bits, decode_chunks_packed
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


@pytest.mark.parametrize("vbr,rb", [(False, 3.0), (True, 2.5)])
def test_tail_rows_all_kernel_paths(vbr, rb):
    """Merged tail rows decode identically on the XLA and Pallas paths, and
    the real prefix is bit-exact vs the one-shot decoder's tail samples."""
    channels, fpc, sff = 2, 100, 20
    st = EncoderSettings(
        residual_bits=rb, frames_per_chunk=fpc, scale_factor_frames=sff, vbr=vbr
    )
    encs = [
        sea_encode(
            varied_signal(channels, 3 * fpc + 17 * i + 1, seed=i),
            TEST_SAMPLE_RATE,
            channels,
            st,
        )
        for i in range(4)
    ]
    staged = [batch._stage_file_parsed(e) for e in encs]
    pb = staged[0][1]
    bw, wp = pb.res_bytes.shape[1], pb.sf.shape[1]
    rows, sfs, rss, hs, ws, fs = [], [], [], [], [], []
    for item in staged:
        ch = item[3]
        assert ch is not None
        sec, sf, rs, f = batch._tail_packed_row(ch, channels, fpc)
        assert sec.shape[0] <= bw
        row = np.zeros(bw, np.uint8)
        row[: sec.shape[0]] = sec
        rows.append(row)
        sfs.append(sf)
        rss.append(rs)
        hs.append(ch.lms_history)
        ws.append(ch.lms_weights)
        fs.append(f)
    rs_arr = np.stack(rss)
    rsz = pb.residual_size
    dqt = jnp.asarray(tables.dqt_stacked(pb.scale_factor_bits).reshape(-1), jnp.int32)
    args = (
        jnp.asarray(np.stack(rows)),
        jnp.asarray(np.stack(sfs)),
        jnp.asarray(rs_arr),
        jnp.asarray(np.stack(hs)),
        jnp.asarray(np.stack(ws)),
        dqt,
    )
    kw = dict(
        scale_factor_frames=sff,
        frames=fpc,
        residual_size=rsz,
        max_code_bits=batch_max_code_bits(rs_arr, rsz),
    )
    base = np.asarray(decode_chunks_packed(*args, use_pallas=False, **kw))
    fused = np.asarray(
        decode_chunks_packed(
            *args, use_pallas=True, pallas_interpret=pallas_interpret(), **kw
        )
    )
    np.testing.assert_array_equal(base, fused)
    for j, (e, f) in enumerate(zip(encs, fs)):
        ref = sea_decode(e).samples
        np.testing.assert_array_equal(
            base[j, :f].reshape(-1), ref[-f * channels :]
        )


@pytest.mark.parametrize("vbr", [False, True])
def test_corpus_tail_only_and_ragged_mix(vbr):
    """Tail-only files (no full chunks -> natural-width group) mixed with
    ragged and exact-multiple files all match the one-shot decoder."""
    channels, fpc = 2, 100
    st = EncoderSettings(
        residual_bits=2.5 if vbr else 3.0, frames_per_chunk=fpc, vbr=vbr
    )
    lens = [37, 99, 100, 63, 251, 700, 1, 200]
    encs = [
        sea_encode(varied_signal(channels, n, seed=n), TEST_SAMPLE_RATE, channels, st)
        for n in lens
    ]
    out = batch.decode_corpus(encs)
    for e, o in zip(encs, out):
        np.testing.assert_array_equal(o.samples, sea_decode(e).samples)


def test_fused_vbr_gate_verdicts():
    """Pin the fused-VBR VMEM gate's verdicts at the bench geometry: the
    channel counts we intend to keep on the single-kernel path stay True,
    and the c=255 scoped-VMEM overflow (observed on v5e) stays rejected.
    A calibration change that silently drops c<=8 off the fused path (or
    re-admits the overflow) fails here."""
    from sea_codec_tpu.ops.pallas_fused_decode import fused_vbr_single_supported

    for mcb in (4, 6, 8):
        for c, want in [(1, True), (2, True), (4, True), (8, True), (255, False)]:
            res_len = packed_byte_len(mcb, 5120 * c)
            assert fused_vbr_single_supported(5120, 20, c, res_len, mcb) == want, (
                f"gate verdict changed for c={c}, mcb={mcb}"
            )
