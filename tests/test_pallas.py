"""Pallas decode kernel correctness.

On CPU the kernels run in interpreter mode; with ``SEA_TEST_PLATFORM=axon``
the same assertions exercise the COMPILED kernels on the real TPU
(conftest.pallas_interpret) -- the committed compiled-path evidence."""

from conftest import pallas_interpret
import jax.numpy as jnp
import numpy as np
import pytest

from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_decode import decode_chunks
from sea_codec_tpu.ops import lms as lms_ops


@pytest.mark.parametrize("shape", [(3, 256, 2), (1, 100, 1), (9, 300, 3)])
def test_pallas_decode_matches_scan(shape):
    n, f, c = shape
    rng = np.random.default_rng(f)
    w = -(-f // 20)
    codes = rng.integers(0, 8, size=(n, f, c)).astype(np.uint8)
    sf = rng.integers(0, 16, size=(n, w, c)).astype(np.uint8)
    rs = np.full((n, w, c), 3, dtype=np.uint8)
    hist = rng.integers(-30000, 30000, size=(n, c, 4)).astype(np.int32)
    wts = np.broadcast_to(lms_ops.initial_weights(c), (n, c, 4)).astype(np.int32)
    dqt = jnp.asarray(tables.dqt_stacked(4).reshape(-1), jnp.int32)

    args = tuple(jnp.asarray(a) for a in (codes, sf, rs, hist, wts))
    ref = decode_chunks(*args, dqt, scale_factor_frames=20)
    pal = decode_chunks(
        *args, dqt, scale_factor_frames=20, use_pallas=True, pallas_interpret=pallas_interpret()
    )
    np.testing.assert_array_equal(np.asarray(pal), np.asarray(ref))


@pytest.mark.parametrize("width", list(range(1, 9)))
def test_unpack_const_strided_matches_reference(width):
    from sea_codec_tpu.ops.device_decode import unpack_const_device, unpack_const_strided

    rng = np.random.default_rng(width)
    count = 997
    nbytes = (count * width + 7) // 8
    data = rng.integers(0, 256, size=(3, nbytes)).astype(np.uint8)
    a = np.asarray(unpack_const_strided(jnp.asarray(data), width, count))
    b = np.asarray(unpack_const_device(jnp.asarray(data), width, count))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_unpack_var_device_matches_scalar(seed):
    """Device variable-width unpack vs the host scalar model, including the
    width-8 / phase-7 funnel edge and values ending at the row boundary."""
    from sea_codec_tpu.ops.bitpack import unpack_bits
    from sea_codec_tpu.ops.device_decode import unpack_var_device

    rng = np.random.default_rng(seed)
    n, count = 5, 701
    widths = rng.integers(1, 9, size=(n, count)).astype(np.int32)
    rows = []
    nbytes = int((widths.sum(axis=1).max() + 7) // 8)
    for i in range(n):
        # exact-length rows so the last value ends at (or near) the row end
        bits = int(widths[i].sum())
        row = rng.integers(0, 256, size=(bits + 7) // 8).astype(np.uint8)
        rows.append(np.pad(row, (0, nbytes - row.shape[0])))
    data = np.stack(rows)
    got = np.asarray(unpack_var_device(jnp.asarray(data), jnp.asarray(widths)))
    for i in range(n):
        want = unpack_bits(data[i], widths[i])
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.parametrize(
    "channels,sff,frames",
    [
        (1, 20, 400),
        (2, 20, 5120),
        (2, 20, 407),  # ragged final window
        (3, 10, 95),
        (8, 5, 40),
        (2, 7, 50),  # sff with no divisor hitting the 40-code target
        (128, 20, 40),  # g = 1 regime (wide-channel corpus lanes)
    ],
)
def test_unpack_var_windowed_matches_scalar(channels, sff, frames):
    """Group-gather VBR unpack vs the host scalar model (bit-exact)."""
    from sea_codec_tpu.ops.bitpack import unpack_bits
    from sea_codec_tpu.ops.device_decode import unpack_var_windowed

    rng = np.random.default_rng(channels * 1000 + sff)
    n = 4
    w = -(-frames // sff)
    rs = rng.integers(1, 9, size=(n, w, channels)).astype(np.int32)
    # expand to per-code widths exactly as the chunk layout does
    # (frame-major, channel-minor; last window may be partial)
    count = frames * channels
    widths = np.broadcast_to(rs[:, :, None, :], (n, w, sff, channels)).reshape(
        n, w * sff * channels
    )[:, :count]
    nbytes = int((widths.sum(axis=1).max() + 7) // 8)
    rows = []
    for i in range(n):
        bits = int(widths[i].sum())
        row = rng.integers(0, 256, size=(bits + 7) // 8).astype(np.uint8)
        rows.append(np.pad(row, (0, nbytes - row.shape[0])))
    data = np.stack(rows)
    want = np.stack([unpack_bits(data[i], widths[i]) for i in range(n)])
    for matmul_fetch in (False, True):
        got = np.asarray(
            unpack_var_windowed(
                jnp.asarray(data),
                jnp.asarray(rs),
                sff,
                frames,
                matmul_fetch=matmul_fetch,
            )
        )
        assert got.shape == (n, count)
        np.testing.assert_array_equal(got, want)
    # tight static span bound (the host passes the batch's real max width)
    got = np.asarray(
        unpack_var_windowed(
            jnp.asarray(data),
            jnp.asarray(rs),
            sff,
            frames,
            max_code_bits=int(rs.max()),
            matmul_fetch=True,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("transposed", [False, True])
def test_fetch_matmul_nomap_matches_blocked(transposed):
    """The single fused-dot fetch (auto-selected under the HBM bound) must
    be word-identical to the blocked lax.map path (huge-batch fallback);
    small unit shapes never reach the blocked branch via the auto gate, so
    both are forced explicitly here."""
    from sea_codec_tpu.ops.device_decode import _fetch_neighborhood_matmul

    rng = np.random.default_rng(7)
    k1, n_words, wg, n = 11, 5, 17, 23
    data = rng.integers(0, 256, size=(n, 4 * (8 * k1 + n_words))).astype(np.uint8)
    base8 = np.sort(
        rng.integers(0, k1, size=(n, wg)).astype(np.int32), axis=1
    )
    outs = [
        np.asarray(
            _fetch_neighborhood_matmul(
                jnp.asarray(data), jnp.asarray(base8), k1, n_words,
                transposed=transposed, nomap=force,
            )
        )
        for force in (True, False)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_select_chain_matches_gather():
    from sea_codec_tpu.ops.device_decode import _select_chain

    rng = np.random.default_rng(0)
    table_f = rng.uniform(-5, 5, size=37).astype(np.float32)
    table_i = rng.integers(-100, 100, size=37).astype(np.int32)
    idx = jnp.asarray(rng.integers(0, 37, size=(4, 9, 3)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(_select_chain(idx, table_f, jnp.float32)),
        table_f[np.asarray(idx)],
    )
    np.testing.assert_array_equal(
        np.asarray(_select_chain(idx, table_i, jnp.int32)),
        table_i[np.asarray(idx)],
    )


@pytest.mark.parametrize(
    "n,fpc,c,sff,sfb,rs",
    [
        (3, 40, 2, 20, 4, 3),
        (5, 100, 1, 20, 4, 1),
        (2, 60, 3, 20, 5, 5),
        (4, 40, 2, 5, 3, 8),
        (1, 25, 2, 5, 4, 2),
        (6, 35, 1, 5, 4, 7),
        (4, 40, 8, 5, 4, 4),
    ],
)
def test_fused_prolog_matches_split_path(n, fpc, c, sff, sfb, rs):
    """The one-pass Pallas unpack+dequant prolog (ops/pallas_dequant.py) is
    bit-identical to the split XLA prolog for every CBR config shape."""
    from sea_codec_tpu.ops.bitpack import pack_bits
    from sea_codec_tpu.ops.device_decode import decode_chunks_packed
    from sea_codec_tpu.ops.pallas_dequant import (
        decode_chunks_packed_fused,
        fused_prolog_supported,
    )

    assert fused_prolog_supported(rs, fpc, sff, c)
    rng = np.random.default_rng(n * 100 + rs)
    w = fpc // sff
    codes = rng.integers(0, 1 << rs, size=(n, fpc * c)).astype(np.uint32)
    res_bytes = np.stack([pack_bits(row, rs) for row in codes])
    sf = rng.integers(0, 1 << sfb, size=(n, w, c)).astype(np.uint8)
    rs_arr = np.full((n, w, c), rs, np.uint8)
    hist = rng.integers(-30000, 30000, size=(n, c, 4)).astype(np.int32)
    wts = rng.integers(-30000, 30000, size=(n, c, 4)).astype(np.int32)
    dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)

    want = np.asarray(
        decode_chunks_packed(
            jnp.asarray(res_bytes), jnp.asarray(sf), jnp.asarray(rs_arr),
            jnp.asarray(hist), jnp.asarray(wts), dqt_flat,
            scale_factor_frames=sff, frames=fpc, residual_size=rs,
            use_pallas=False,
        )
    )
    got = np.asarray(
        decode_chunks_packed_fused(
            jnp.asarray(res_bytes), jnp.asarray(sf),
            jnp.asarray(hist), jnp.asarray(wts),
            scale_factor_frames=sff, frames=fpc, residual_size=rs, sfb=sfb,
            interpret=pallas_interpret(),
        )
    )
    np.testing.assert_array_equal(got, want)

    # lane-major output (for on-device consumers): [F, C*Npad] with
    # lane = ch*Npad + chunk must carry the same PCM without the transpose
    from sea_codec_tpu.ops.pallas_dequant import LANES

    lane = np.asarray(
        decode_chunks_packed_fused(
            jnp.asarray(res_bytes), jnp.asarray(sf),
            jnp.asarray(hist), jnp.asarray(wts),
            scale_factor_frames=sff, frames=fpc, residual_size=rs, sfb=sfb,
            interpret=pallas_interpret(), lane_output=True,
        )
    )
    npad = -(-n // LANES) * LANES
    assert lane.shape == (fpc, c * npad)
    np.testing.assert_array_equal(
        lane.reshape(fpc, c, npad)[:, :, :n].transpose(2, 0, 1), want
    )


def _pack_var_rows(codes, widths):
    """MSB-first variable-width packer (scalar model of bits.rs:104-134),
    one row per chunk, rows zero-padded to the longest."""
    rows = []
    for crow, wrow in zip(codes, widths):
        acc, nbits, out = 0, 0, []
        for v, wd in zip(crow, wrow):
            acc = (acc << int(wd)) | int(v)
            nbits += int(wd)
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        rows.append(out)
    b = max(len(r) for r in rows)
    return np.array([r + [0] * (b - len(r)) for r in rows], np.uint8)


@pytest.mark.parametrize(
    "n,fpc,c,sff,sfb,mcb",
    [
        (3, 40, 2, 20, 4, 4),
        (5, 100, 1, 20, 4, 8),
        (2, 60, 3, 20, 5, 6),
        (4, 40, 8, 5, 4, 4),
        (1, 25, 2, 5, 3, 8),
        (6, 35, 7, 5, 5, 2),
        (2, 82, 1, 41, 4, 8),  # gc=1 (mono, prime sff): block-planner edge
    ],
)
def test_fused_vbr_matches_xla_path(n, fpc, c, sff, sfb, mcb):
    """The fused VBR Pallas extraction+dequant (ops/pallas_dequant.py) is
    bit-identical to the XLA windowed-unpack path for mixed per-window
    residual sizes (reference layout chunk.rs:245-278)."""
    from sea_codec_tpu.ops.device_decode import (
        decode_chunks_packed_fn,
    )
    from sea_codec_tpu.ops.pallas_dequant import (
        decode_chunks_packed_fused_vbr,
        fused_vbr_supported,
    )

    rng = np.random.default_rng(n * 1000 + c * 10 + sfb)
    w = fpc // sff
    rs_arr = rng.integers(1, mcb + 1, size=(n, w, c)).astype(np.uint8)
    # per-code widths in the residual-section layout: frame-major,
    # channel-minor within each window
    widths = np.repeat(rs_arr.astype(np.int32), sff, axis=1).reshape(n, fpc * c)
    codes = rng.integers(0, 1 << 8, size=(n, fpc * c)) & ((1 << widths) - 1)
    res_bytes = _pack_var_rows(codes, widths)
    assert fused_vbr_supported(fpc, sff, c, res_bytes.shape[1])
    sf = rng.integers(0, 1 << sfb, size=(n, w, c)).astype(np.uint8)
    hist = rng.integers(-30000, 30000, size=(n, c, 4)).astype(np.int32)
    wts = rng.integers(-30000, 30000, size=(n, c, 4)).astype(np.int32)
    dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)

    want = np.asarray(
        decode_chunks_packed_fn(
            jnp.asarray(res_bytes), jnp.asarray(sf), jnp.asarray(rs_arr),
            jnp.asarray(hist), jnp.asarray(wts), dqt_flat,
            scale_factor_frames=sff, frames=fpc, residual_size=0,
            use_pallas=False, max_code_bits=mcb,
        )
    )
    got = np.asarray(
        decode_chunks_packed_fused_vbr(
            jnp.asarray(res_bytes), jnp.asarray(sf), jnp.asarray(rs_arr),
            jnp.asarray(hist), jnp.asarray(wts),
            scale_factor_frames=sff, frames=fpc, sfb=sfb,
            max_code_bits=mcb, interpret=pallas_interpret(),
        )
    )
    np.testing.assert_array_equal(got, want)
