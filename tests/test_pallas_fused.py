"""Single-kernel fused CBR decode (ops/pallas_fused_decode.py) bit-equality.

Interpret-mode Pallas vs the production XLA decode path on the same parsed
chunks — any divergence in the unpack geometry, curve math, or recurrence
carry shows up as a sample mismatch."""

from conftest import pallas_interpret
import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.batch import parse_full_chunks, split_chunks
from sea_codec_tpu.ops.pallas_fused_decode import (
    decode_chunks_packed_fused_single,
    fused_single_supported,
)
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


@pytest.mark.parametrize(
    "channels,rs,fpc,sff",
    [
        (1, 3, 200, 20),
        (2, 3, 200, 20),
        (2, 1, 200, 20),
        (2, 5, 100, 20),
        (3, 4, 200, 20),
        (2, 8, 100, 10),
    ],
)
def test_fused_single_matches_api(channels, rs, fpc, sff):
    assert fused_single_supported(rs, fpc, sff, channels)
    frames = 3 * fpc
    sig = varied_signal(channels, frames, seed=55)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff, residual_bits=float(rs)
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, tail = split_chunks(encoded)
    assert not tail
    b = parse_full_chunks(rect, header)

    out = np.asarray(
        decode_chunks_packed_fused_single(
            b.res_bytes, b.sf, b.hist, b.wts,
            scale_factor_frames=sff, frames=fpc, residual_size=rs,
            sfb=b.scale_factor_bits, interpret=pallas_interpret(),
        )
    )
    want = np.asarray(sea_decode(encoded).samples).reshape(-1, fpc, channels)
    np.testing.assert_array_equal(out, want)


def test_fused_single_packed32_kernel_path():
    """The int32-packed input variant of the kernel (kept for measurement,
    rejected as the default: scripts/exp_byte_transpose.py) stays
    bit-identical to the uint8 path."""
    import jax
    import jax.numpy as jnp

    from sea_codec_tpu.ops.device_decode import _dequant_window_constants
    from sea_codec_tpu.ops.pallas_dequant import _plan_blocks
    from sea_codec_tpu.ops.pallas_fused_decode import (
        G_SUB,
        decode_cbr_fused_single,
    )

    channels, rs, fpc, sff = 2, 3, 200, 20
    sig = varied_signal(channels, 2 * fpc, seed=57)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff, residual_bits=float(rs)
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, _ = split_chunks(encoded)
    b = parse_full_chunks(rect, header)

    n, w, c = b.sf.shape
    m, wp = _plan_blocks(w, sff, c, rs)
    brows = (m * sff * c * rs) // 8
    assert brows % 4 == 0
    npad = -(-n // (G_SUB * 128)) * (G_SUB * 128)
    gt = npad // 128
    btot = (wp // m) * brows
    breal = min(b.res_bytes.shape[1], btot)
    rows8 = jnp.zeros((n, btot), jnp.uint8).at[:, :breal].set(
        jnp.asarray(b.res_bytes)[:, :breal]
    )
    r32 = jax.lax.bitcast_convert_type(rows8.reshape(n, btot // 4, 4), jnp.int32)
    feed = jnp.zeros((btot // 4, npad), jnp.int32).at[:, :n].set(r32.T)
    sfval_win, *_ = _dequant_window_constants(
        jnp.asarray(b.sf, jnp.int32), jnp.full((n, w, c), rs, jnp.int32),
        b.scale_factor_bits, rs,
    )
    sfvalT = jnp.zeros((wp, c, npad), jnp.float32).at[:w, :, :n].set(
        jnp.transpose(sfval_win, (1, 2, 0))
    )
    state = jnp.concatenate(
        [jnp.asarray(b.hist, jnp.int32), jnp.asarray(b.wts, jnp.int32)], axis=-1
    )
    lms = jnp.zeros((8, c, npad), jnp.int32).at[:, :, :n].set(
        jnp.transpose(state, (2, 1, 0))
    )
    out = decode_cbr_fused_single(
        feed.reshape(btot // 4, gt, 128),
        sfvalT.reshape(wp, c, gt, 128),
        lms.reshape(8, c, gt, 128),
        rs=rs, sff=sff, c=c, m=m, interpret=pallas_interpret(), packed32=True,
    )
    got = np.asarray(out.reshape(wp * sff, c, npad)[:fpc, :, :n]).transpose(
        2, 0, 1
    )
    want = np.asarray(sea_decode(encoded).samples).reshape(-1, fpc, channels)
    np.testing.assert_array_equal(got, want)


def test_fused_single_lane_output_layout():
    channels, rs, fpc, sff = 2, 3, 200, 20
    sig = varied_signal(channels, 2 * fpc, seed=56)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff, residual_bits=float(rs)
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, _ = split_chunks(encoded)
    b = parse_full_chunks(rect, header)
    lane = np.asarray(
        decode_chunks_packed_fused_single(
            b.res_bytes, b.sf, b.hist, b.wts,
            scale_factor_frames=sff, frames=fpc, residual_size=rs,
            sfb=b.scale_factor_bits, interpret=pallas_interpret(), lane_output=True,
        )
    )
    n = rect.shape[0]
    npad = lane.shape[1] // channels
    full = np.asarray(sea_decode(encoded).samples).reshape(n, fpc, channels)
    # lane = ch * npad + chunk (the recurrence kernels' native layout)
    got = lane.reshape(fpc, channels, npad)[:, :, :n].transpose(2, 0, 1)
    np.testing.assert_array_equal(got, full)


@pytest.mark.parametrize(
    "channels,target,fpc,sff",
    [
        (1, 2.5, 200, 20),
        (2, 2.5, 200, 20),
        (2, 5.0, 100, 20),
        (3, 3.5, 200, 20),
        (2, 7.5, 100, 10),
    ],
)
def test_vbr_fused_single_matches_api(channels, target, fpc, sff):
    from sea_codec_tpu.ops.pallas_fused_decode import (
        decode_chunks_packed_fused_vbr_single,
    )

    frames = 3 * fpc
    sig = varied_signal(channels, frames, seed=57)
    st = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff,
        residual_bits=target, vbr=True,
    )
    encoded = sea_encode(sig, TEST_SAMPLE_RATE, channels, st)
    header, rect, tail = split_chunks(encoded)
    assert not tail
    b = parse_full_chunks(rect, header)

    out = np.asarray(
        decode_chunks_packed_fused_vbr_single(
            b.res_bytes, b.sf, b.rs, b.hist, b.wts,
            scale_factor_frames=sff, frames=fpc,
            sfb=b.scale_factor_bits,
            max_code_bits=int(np.max(b.rs)),
            interpret=pallas_interpret(),
        )
    )
    want = np.asarray(sea_decode(encoded).samples).reshape(-1, fpc, channels)
    np.testing.assert_array_equal(out, want)


def test_plan_single_respects_vmem_row_bound():
    """Regression: _plan_blocks alone produced 480-row blocks at channels=3
    (16.88 MB of scoped VMEM for the unpack temps, past the 16 MB hardware
    limit; CPU interpret mode enforces no limit so only the real-TPU suite
    saw it). _plan_single must keep out_rows <= MAX_OUT_ROWS whenever the
    single-kernel path claims support, while preserving _plan_blocks's
    byte-alignment and divisibility invariants."""
    from sea_codec_tpu.ops.pallas_fused_decode import (
        MAX_OUT_ROWS,
        _plan_single,
        fused_single_supported,
    )

    for c in range(1, 9):
        for rs in range(1, 9):
            for fpc, sff in [(200, 20), (100, 20), (100, 10), (5120, 20), (2560, 10)]:
                if fpc % sff:
                    continue
                w = fpc // sff
                m, wp = _plan_single(w, sff, c, rs)
                assert (m * sff * c * rs) % 8 == 0, (c, rs, fpc, sff)
                assert wp % m == 0 and wp >= w, (c, rs, fpc, sff)
                if fused_single_supported(rs, fpc, sff, c):
                    assert m * sff * c <= MAX_OUT_ROWS, (c, rs, fpc, sff)

    # the exact geometry the hardware suite caught: channels=3 defaults
    m3, _ = _plan_single(5120 // 20, 20, 3, 3)
    assert m3 * 20 * 3 <= MAX_OUT_ROWS
