"""Batched chunk decoding on device (JAX).

The SEA format makes chunk decode embarrassingly parallel: every chunk
carries its own per-channel LMS entry state (reference ``README.md:99-102``,
``src/codec/chunk.rs:95-103``), so a batch of N chunks decodes as one
``lax.scan`` over frames with all chunks x channels vectorized in the batch
dimensions. Per-sample semantics mirror the reference decoder hot loop
(``src/codec/decoder.rs:20-86``): predict -> dequantize (table lookup) ->
clamp -> LMS update.

Design notes (TPU):
- The dequantized values depend only on (residual_size, scale_factor, code),
  none of which depend on the LMS recurrence -- so the table gather is hoisted
  *out* of the scan and fully vectorized; the scan body is pure int32
  element-wise math over [N, C] lanes.
- Residual size is data (uint8 per window), so one compiled kernel serves
  CBR, VBR, and any mix of chunk configurations with the same shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lms


def _select_chain(idx: jnp.ndarray, values: np.ndarray, dtype) -> jnp.ndarray:
    """Tiny-table lookup as a fused compare/select chain (NO gather).

    XLA TPU gathers cost ~ns/element; on the decode prolog's [N, W, C]
    window-constant lookups they dominated the whole decode (153 of 218 ms
    on the 252-Msample bench shape). The tables here have <= 2^sfb entries,
    so a chain of elementwise selects -- which XLA fuses into a single VPU
    pass -- is ~50x cheaper than the gather.
    """
    acc = jnp.full(idx.shape, values[0], dtype)
    for i in range(1, len(values)):
        v = values[i]
        acc = jnp.where(idx == i, dtype(v), acc)
    return acc


def _dequant_window_constants(
    sf_w: jnp.ndarray,  # int32[N, W, C]
    rs_w: jnp.ndarray,  # int32[N, W, C]
    sfb: int,
    static_rs: int = 0,  # >0: every window uses this residual size (CBR)
):
    """Per-window dequant constants (sfval, c0, stepf, endv, kmax), gather-free."""
    from .pallas_encode import _rs_constants

    sfval_t, _recip, c0_t, stepf_t, endv_t, kmax_t, _cl = _rs_constants(sfb)
    s = 1 << sfb
    if static_rs:
        r = static_rs
        sfval = _select_chain(sf_w, sfval_t[r], jnp.float32)
        c0 = jnp.float32(c0_t[r])
        stepf = jnp.float32(stepf_t[r])
        endv = jnp.float32(endv_t[r])
        kmax = jnp.int32(int(kmax_t[r]))
        return sfval, c0, stepf, endv, kmax
    # mixed residual sizes (VBR): combined select over (rs, sf) for sfval,
    # 8-entry chains for the rs-only tables
    idx = rs_w * s + sf_w
    if 9 * s > 512:  # sfb 6..8 (9*64=576): the chain would out-cost the gather
        sfval = jnp.asarray(sfval_t.reshape(-1))[idx]
    else:
        sfval = _select_chain(idx, sfval_t.reshape(-1), jnp.float32)
    c0 = _select_chain(rs_w, c0_t, jnp.float32)
    stepf = _select_chain(rs_w, stepf_t, jnp.float32)
    endv = _select_chain(rs_w, endv_t, jnp.float32)
    kmax = _select_chain(rs_w, kmax_t, jnp.int32)
    return sfval, c0, stepf, endv, kmax


def dequant_codes(
    codes: jnp.ndarray,  # uint8[N, F, C] quantized residual codes
    sf_codes: jnp.ndarray,  # uint8[N, W, C] scale factors per window
    rs: jnp.ndarray,  # uint8[N, W, C] residual sizes per window (1..8)
    sfb: int,
    scale_factor_frames: int,
    static_rs: int = 0,  # >0: every window uses this residual size (CBR)
) -> jnp.ndarray:
    """Production dequantization: codes -> int16[N, F, C] dequantized values.

    Per-window constants via fused select chains (NO gathers -- see
    _select_chain), then the per-sample value computed *arithmetically* -- a
    [N, F, C]-sized table gather here would dominate the whole decode (XLA
    TPU gathers are ~ns/element). The closed forms reproduce the table
    build exactly (see FORMAT.md and ops/pallas_encode.py); bit-equality
    with the gather path is tested. Shared with the perf-attribution
    scripts so measurements can never drift from the shipped math.
    """
    n, f, c = codes.shape
    w = sf_codes.shape[1]
    sf_w = sf_codes.astype(jnp.int32)
    rs_w = rs.astype(jnp.int32)
    sfval_win, c0_win, stepf_win, endv_win, kmax_win = _dequant_window_constants(
        sf_w, rs_w, sfb, static_rs
    )

    # Window-blocked broadcast: reshape codes to [N, W, sff, C] so the
    # per-window constants broadcast along the sff axis in-register. (The
    # previous jnp.repeat-based per-frame expansion materialized five
    # [N, F, C] repeat gathers and dominated the whole decode: 168 of
    # 218 ms on the 252-Msample bench shape. A padding-free channel-major
    # [W, sff, C*N] layout and an integer dqt-select-chain variant were
    # both prototyped on TPU and measured no better / 20% worse -- see
    # IMPLEMENTATION_NOTES.md and scripts/perf_decode_stages3.py.)
    reps = scale_factor_frames
    fp = w * reps
    q = codes.astype(jnp.int32)
    if fp != f:
        q = jnp.pad(q, ((0, 0), (0, fp - f), (0, 0)))
    q = q.reshape(n, w, reps, c)
    # [N, W, C] -> broadcast over sff; static-CBR constants are scalars
    pw = lambda x: x[:, :, None, :] if getattr(x, "ndim", 0) == 3 else x
    k = q >> 1
    kf = k.astype(jnp.float32)
    curve = jnp.float32(0.5) + kf * pw(stepf_win)
    curve = jnp.where(k == pw(kmax_win), pw(endv_win), curve)
    curve = jnp.where(k == 0, pw(c0_win), curve)
    dq_abs = jnp.floor(pw(sfval_win) * curve + jnp.float32(0.5)).astype(jnp.int32)
    dq = jnp.where((q & 1) == 1, -dq_abs, dq_abs)
    # int16 interface to the recurrence: |dq| <= 27090 for EVERY legal
    # (sfb, rs) pair (asserted exhaustively in test_tables), so the
    # dequant-write, lane transpose, and kernel-read traffic all halve
    dq = dq.astype(jnp.int16)
    return dq.reshape(n, fp, c)[:, :f]


def decode_chunks_fn(
    codes: jnp.ndarray,  # uint8[N, F, C] quantized residual codes
    sf_codes: jnp.ndarray,  # uint8[N, W, C] scale factors per window
    rs: jnp.ndarray,  # uint8[N, W, C] residual sizes per window (1..8)
    hist0: jnp.ndarray,  # int32[N, C, 4] chunk-entry LMS history
    wts0: jnp.ndarray,  # int32[N, C, 4] chunk-entry LMS weights
    dqt_flat: jnp.ndarray,  # int32[8 * n_sf * 256] stacked dequant table
    scale_factor_frames: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    static_rs: int = 0,  # >0: every window uses this residual size (CBR)
) -> jnp.ndarray:
    """Decode a batch of chunks -> int16[N, F, C]."""
    f = codes.shape[1]
    w = sf_codes.shape[1]
    n_sf = dqt_flat.shape[0] // (8 * 256)
    assert w * scale_factor_frames >= f
    sfb = int(np.log2(n_sf))

    # Design note: a fused kernel that dequantizes *inside* the Pallas LMS
    # kernel (cutting the [N, F, C] dq intermediate out of HBM) was built
    # and measured bit-exact but ~1.9x SLOWER end to end on v5e, invariant
    # under const-load hoisting and a vectorized dequant phase into VMEM
    # scratch -- the XLA prolog + plain recurrence kernel below is the
    # faster split, so it stays.
    dq = dequant_codes(codes, sf_codes, rs, sfb, scale_factor_frames, static_rs)

    if use_pallas:
        # (a lane-major variant that transposes the 1-byte codes instead of
        # the int32 dq measured ~4% slower -- XLA already fuses this
        # transpose into the dequant producer, so [N, F, C] stays)
        from .pallas_decode import decode_scan_pallas

        return decode_scan_pallas(dq, hist0, wts0, interpret=pallas_interpret)

    def step(carry, dq_t):
        hist, wts = carry
        pred = lms.predict(hist, wts)  # [N, C]
        recon = lms.clamp_i16(pred + dq_t)
        hist, wts = lms.update(hist, wts, recon, dq_t)
        return (hist, wts), recon.astype(jnp.int16)

    dq_scan = jnp.moveaxis(dq, 1, 0)  # [F, N, C]
    (_, _), recon = jax.lax.scan(step, (hist0, wts0), dq_scan)
    return jnp.moveaxis(recon, 0, 1)  # [N, F, C]


decode_chunks = jax.jit(
    decode_chunks_fn,
    static_argnames=(
        "scale_factor_frames",
        "use_pallas",
        "pallas_interpret",
        "static_rs",
    ),
)


def _bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[N, B] -> uint8[N, B*8] MSB-first bit expansion (VPU-friendly)."""
    n, b = data.shape
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(n, b * 8)


def unpack_const_device(data: jnp.ndarray, width: int, count: int) -> jnp.ndarray:
    """Constant-width MSB-first unpack on device -> uint8[N, count].

    The gather indices are static (layout identical for every row), so this
    lowers to one bit-expansion plus one static gather -- the device-side
    replacement for the reference's streaming byte loop (bits.rs:34-50).
    """
    bits = _bytes_to_bits(data)
    offsets = np.arange(count, dtype=np.int32) * width
    j = np.arange(width, dtype=np.int32)
    idx = (offsets[:, None] + j[None, :]).reshape(-1)
    gathered = jnp.take(bits, jnp.asarray(idx), axis=1).reshape(-1, count, width)
    weights = jnp.asarray((1 << (width - 1 - j)).astype(np.uint8))
    return jnp.sum(gathered * weights[None, None, :], axis=2, dtype=jnp.uint8)


def unpack_const_strided(data: jnp.ndarray, width: int, count: int) -> jnp.ndarray:
    """Gather-free constant-width unpack via the bitstream's periodicity.

    A w-bit MSB-first stream repeats every lcm(w, 8) bits = p bytes carrying
    g codes; code j of each group spans at most two bytes at a static offset.
    Building a 16-bit sliding window over the row turns extraction into g
    static *strided slices* + shifts -- no gather anywhere, pure VPU work.
    """
    import math

    n, b = data.shape
    p = (w_lcm := (width * 8) // math.gcd(width, 8)) // 8  # bytes per period
    g = w_lcm // width  # codes per period
    groups = -(-count // g)
    need = groups * p + 1
    if b < need:
        data = jnp.pad(data, ((0, 0), (0, need - b)))
    d16 = data.astype(jnp.int32)
    u16 = (d16[:, : groups * p] << 8) | d16[:, 1 : groups * p + 1]  # [N, groups*p]
    mask = jnp.int32((1 << width) - 1)
    cols = []
    for j in range(g):
        bit = width * j
        off = bit // 8
        shift = jnp.int32(16 - (bit % 8) - width)
        cols.append((u16[:, off :: p] >> shift) & mask)  # [N, groups]
    codes = jnp.stack(cols, axis=2).reshape(n, groups * g)  # [N, groups*g]
    return codes[:, :count].astype(jnp.uint8)


def unpack_var_device(data: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """Per-item-width MSB-first unpack on device.

    ``widths``: int32[N, count] (each row its own layout -- VBR residuals).
    Bit offsets come from a per-row cumsum. An item is <= 8 bits, so with a
    16-bit sliding window over the row it spans exactly ONE window: the
    dynamic access is a single take_along_axis per item (an 8-bit-gather
    formulation measured ~8x slower -- TPU gathers cost ~ns/element, so
    gathered-element count is the budget). Replaces bits.rs:52-70.
    """
    n, count = widths.shape
    d = data.astype(jnp.int32)
    # u16[j] = (bytes[j] << 8) | bytes[j+1]; last window low byte = 0
    u16 = (d << 8) | jnp.pad(d[:, 1:], ((0, 0), (0, 1)))
    offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
    win = jnp.take_along_axis(u16, offsets >> 3, axis=1)  # [N, count]
    shift = jnp.int32(16) - (offsets & 7) - widths
    mask = (jnp.int32(1) << widths) - 1
    return ((win >> shift) & mask).astype(jnp.uint8)


def _group_frames(scale_factor_frames: int, channels: int) -> int:
    """Frames per gather group: largest divisor of sff with <= ~40 codes.

    Keeps the gathered span per group at <= 12 int32 words (the V4 sweet
    spot from scripts/perf_vbr_gather.py) while group boundaries stay
    aligned to window-internal frame offsets (g | sff => no layout holes).
    """
    g = 1
    for d in range(1, scale_factor_frames + 1):
        if scale_factor_frames % d == 0 and d * channels <= 40:
            g = d
    return g


def _fetch_neighborhood_matmul(
    data: jnp.ndarray,  # uint8[N, >= 4*(8*k1 + n_words)] padded byte rows
    base8: jnp.ndarray,  # int32[N, WG] 8-word-aligned block index per group
    k1: int,  # one-hot width = number of 8-word blocks per row
    n_words: int,  # int32 words per fetched neighborhood
    transposed: bool = False,  # True: uint32[WG, n_words, N] (lane-major
    # for the fused VBR Pallas prolog: chunks land on the minor axis)
    nomap: bool | None = None,  # None = auto by HBM bound; tests force both
) -> jnp.ndarray:  # uint32[N, n_words, WG]
    """Neighborhood-word fetch as a one-hot bf16 matmul on the MXU.

    XLA TPU dynamic gathers cost ~13 ns/element no matter how they are
    phrased (scripts/perf_vbr_gather.py), which made the word fetch ~96% of
    the whole VBR decode. The MXU does the same selection at matmul speed:
    out[n, wg, (p, b)] = sum_j onehot(j == base8[n, wg]) * plane_b[n, 8j+p].
    Addressing 8-word-ALIGNED blocks instead of exact start words shrinks
    the one-hot contraction 8x (the one-hot build/read is the dominant HBM
    traffic); the extraction select-chains absorb the <=255-bit in-block
    phase. Exactness: byte values 0..255 and 0/1 mask entries are exact in
    bfloat16, and each dot-product row has exactly one nonzero term, so the
    f32 accumulation is the exact integer -- no rounding anywhere.
    """
    n, wg = base8.shape
    nw4 = n_words * 4
    # One fused dot over the whole batch beats lax.map blocking when XLA
    # can keep the one-hot fused into the contraction: 57.7 -> 42.8 ms on
    # the 49152-chunk bench shape (scripts/exp_vbr_fetch.py variant G; the
    # blocked map serializes dispatches and re-materializes operand tiles
    # per block). Gate on the materialized-one-hot bound in case XLA does
    # spill it: [N, WG, k1] bf16 <= ~3.8 GB covers the bench shapes (up to
    # 3.4 GB at the 73728-chunk VBR batch, measured on-device without HBM
    # pressure -- XLA keeps the one-hot fused into the contraction) while
    # still routing truly huge batches to the blocked fallback.
    if nomap is None:
        nomap = n * wg * k1 * 2 <= (7 << 29)
    # block over rows; per-block buffers (the [blk, WG, k1] one-hot and,
    # for huge batches, the [blk, 8*k1, nw4] shifted-plane stack) bound
    # live HBM regardless of batch size
    blk = n if nomap else max(8, min(n, 4096, (1 << 30) // max(1, wg * k1)))
    n_pad = -(-n // blk) * blk
    # shifted byte planes: S[n, j, (p, b)] = byte[n, 4*(8*j + p) + b]. Built
    # once outside the map when the stack fits comfortably (one fused pass
    # over the whole batch measures faster than per-block rebuilds).
    prebuild = n * k1 * nw4 * 2 <= (5 << 28)  # <= 1.25 GB bf16

    def make_s(d_rows):
        planes = [d_rows[:, b::4] for b in range(4)]
        cols = []
        for p in range(n_words):
            for b4 in range(4):
                cols.append(planes[b4][:, p : p + 8 * k1 : 8])
        return jnp.stack(cols, axis=2).astype(jnp.bfloat16)  # [., k1, nw4]

    iota_k = jnp.arange(k1, dtype=jnp.int32)

    def pick(b8_b, s_b):
        onehot = (b8_b[:, :, None] == iota_k[None, None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            onehot,
            s_b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [blk, WG, nw4]
        return out.astype(jnp.int32)

    if nomap:
        out = pick(base8, make_s(data))
    else:
        if n_pad != n:
            base8 = jnp.pad(base8, ((0, n_pad - n), (0, 0)))
            data = jnp.pad(data, ((0, n_pad - n), (0, 0)))
        b8_blocks = base8.reshape(-1, blk, wg)
        if prebuild:
            s_blocks = make_s(data).reshape(-1, blk, k1, nw4)
            out = jax.lax.map(lambda a: pick(*a), (b8_blocks, s_blocks))
        else:
            d_blocks = data.reshape(-1, blk, data.shape[1])
            out = jax.lax.map(lambda a: pick(a[0], make_s(a[1])), (b8_blocks, d_blocks))
    out = out.reshape(n_pad, wg, n_words, 4)[:n]
    words = (
        (out[..., 0].astype(jnp.uint32) << 24)
        | (out[..., 1].astype(jnp.uint32) << 16)
        | (out[..., 2].astype(jnp.uint32) << 8)
        | out[..., 3].astype(jnp.uint32)
    )  # [N, WG, n_words]
    if transposed:
        return jnp.transpose(words, (1, 2, 0))  # [WG, n_words, N]
    return jnp.moveaxis(words, 1, 2)  # [N, n_words, WG]


def _vbr_group_addressing(rs32, frames: int, sff: int, c: int):
    """Affine VBR group addressing, SHARED by the XLA windowed unpack and
    the fused Pallas prolog (a divergence here would make the two paths
    read different bit offsets): returns (g, n_groups, wg, gc, wsum [N,W],
    prefix [N,W,C], gstart [N,WG]). dtypes pinned: under jax_enable_x64
    sum/cumsum of int32 promote to int64, silently doubling the traffic of
    every offset plane downstream."""
    n, w, _ = rs32.shape
    g = _group_frames(sff, c)
    n_groups = sff // g
    wg = w * n_groups
    gc = g * c
    wsum = jnp.sum(rs32, axis=2, dtype=jnp.int32)  # [N, W] bits per frame
    prefix = jnp.cumsum(rs32, axis=2, dtype=jnp.int32) - rs32  # [N, W, C]
    # frames actually present per window (only the last can be partial)
    fiw = np.clip(frames - np.arange(w) * sff, 0, sff).astype(np.int32)  # [W]
    win_bits = jnp.asarray(fiw)[None, :] * wsum
    win_start = jnp.cumsum(win_bits, axis=1, dtype=jnp.int32) - win_bits  # [N, W]
    grp = jnp.arange(n_groups, dtype=jnp.int32) * g  # [G] frame offsets
    gstart = (
        win_start[:, :, None] + grp[None, None, :] * wsum[:, :, None]
    ).reshape(n, wg)
    return g, n_groups, wg, gc, wsum, prefix, gstart


def _vbr_span(gc: int, max_code_bits: int) -> int:
    """Fetched words per group for exact-word addressing: 31 bits of phase
    + worst-case group payload, +1 word for the (wj, wj+1) pair at the last
    in-span offset."""
    return (31 + gc * max_code_bits + 31) // 32 + 1


def _vbr_fetch_geometry(b: int, gc: int, max_code_bits: int):
    """8-word-aligned matmul-fetch geometry, shared by both VBR decode
    paths: (bw word-row length, k1 one-hot width, n_words per neighborhood,
    need padded byte length). The <= 255-bit in-block phase is absorbed by
    a wider neighborhood."""
    bw = -(-b // 4) + _vbr_span(gc, max_code_bits)
    k1 = -(-bw // 8) + 1
    n_words = (255 + gc * max_code_bits + 31) // 32 + 1
    need = 4 * (8 * k1 + n_words)
    return bw, k1, n_words, need


def unpack_var_windowed(
    data: jnp.ndarray,  # uint8[N, B] packed residual section
    rs: jnp.ndarray,  # int32[N, W, C] per-window residual sizes (1..8)
    scale_factor_frames: int,
    frames: int,
    max_code_bits: int = 8,
    matmul_fetch: bool = False,
) -> jnp.ndarray:
    """VBR unpack with per-GROUP (not per-code) dynamic addressing.

    ``unpack_var_device`` pays one dynamic gather element per code; XLA TPU
    gathers cost ~13 ns/element regardless of layout (measured: minor-axis,
    major-axis, flat and lax.gather-slice formulations all land within 2%,
    scripts/perf_vbr_gather.py), so at count = frames x C elements the
    gather IS the decode time. Within one scale-factor window, widths are
    constant per channel (chunk.rs:245-252 layout: frame-major,
    channel-minor), so code bit offsets are AFFINE in (frame, channel):

        bit(w, t, c) = win_start[w] + t * wsum[w] + prefix[w, c]

    Only win_start is truly dynamic. We gather a fixed span of int32 words
    once per g-frame GROUP (g*C codes), then extract every code with pure
    VPU arithmetic: a span-deep compare/select chain picks each code's word
    pair in registers. Net: ~g*C/span ~ 3.3x fewer gathered elements, and
    the select chains fuse into one elementwise pass.
    """
    n, w, c = rs.shape
    b = data.shape[1]
    sff = scale_factor_frames
    rs32 = rs.astype(jnp.int32)
    g, n_groups, wg, gc, wsum, prefix, gstart = _vbr_group_addressing(
        rs32, frames, sff, c
    )
    # max_code_bits lets the caller shrink the worst-case span to the
    # batch's actual largest residual size (host-known from the parsed
    # chunk headers) -- at VBR target 2.5 that is 4 bits, span 7 not 12.
    span = _vbr_span(gc, max_code_bits)
    bw, k1, n_words, need = _vbr_fetch_geometry(b, gc, max_code_bits)

    # Layout rule (hard-won: the first cut used [N, W, G, g, C] temps whose
    # degenerate minor dims tile-padded 128x and OOM'd at 12k chunks): every
    # slot-sized array lives as [N, gC, WG] with the LARGE window-group axis
    # minor, so chain temps are unpadded and the whole extraction fuses.

    # big-endian int32 words over the (padded) byte rows
    pad = bw * 4 - b
    d = jnp.pad(data, ((0, 0), (0, pad))).astype(jnp.uint32)
    words_row = (
        (d[:, 0::4] << 24) | (d[:, 1::4] << 16) | (d[:, 2::4] << 8) | d[:, 3::4]
    )  # uint32[N, bw]

    # for extreme rows (chunk_size-scale payloads) the one-hot K dimension
    # outgrows the matmul's advantage over the 13 ns/element gather
    if matmul_fetch and bw <= 32768:
        # 8-word-aligned neighborhoods: the one-hot contraction is over k1 =
        # bw/8 blocks (8x less one-hot traffic than exact-word addressing)
        base8 = jnp.minimum(gstart >> 8, k1 - 1)  # [N, WG]
        phase = gstart - (base8 << 8)  # < 256 except clamped tail garbage
        words = _fetch_neighborhood_matmul(
            jnp.pad(data, ((0, 0), (0, need - b))), base8, k1, n_words
        )
    else:
        word0 = jnp.minimum(gstart >> 5, bw - span)  # [N, WG]
        phase = gstart - (word0 << 5)  # < 32 except clamped tail garbage
        # gather directly into [N, span, WG] (no transpose afterwards)
        j = jnp.arange(span, dtype=jnp.int32)
        gidx = (word0[:, None, :] + j[None, :, None]).reshape(n, span * wg)
        words = jnp.take_along_axis(words_row, gidx, axis=1).reshape(n, span, wg)
    nw = words.shape[1]  # fetched words per group (span or n_words)

    # per-window scalars expanded to [N, WG] (tiny, materialize freely)
    expand_wg = lambda a: jnp.broadcast_to(a[:, :, None], (n, w, n_groups)).reshape(
        n, wg
    )
    wsum_wg = expand_wg(wsum)

    # per-slot offsets/widths via per-channel select chains over the gC axis
    # (index = t*C + c) -- elementwise, fuses; no slot-sized broadcast-reshape
    tvec = (jnp.arange(gc, dtype=jnp.int32) // c)[None, :, None]  # frame-in-group
    cvec = (jnp.arange(gc, dtype=jnp.int32) % c)[None, :, None]
    pre_slot = jnp.broadcast_to(expand_wg(prefix[:, :, 0])[:, None, :], (n, gc, wg))
    wid_slot = jnp.broadcast_to(expand_wg(rs32[:, :, 0])[:, None, :], (n, gc, wg))
    for ci in range(1, c):
        sel = cvec == ci
        pre_slot = jnp.where(sel, expand_wg(prefix[:, :, ci])[:, None, :], pre_slot)
        wid_slot = jnp.where(sel, expand_wg(rs32[:, :, ci])[:, None, :], wid_slot)

    local = phase[:, None, :] + tvec * wsum_wg[:, None, :] + pre_slot  # [N, gC, WG]
    wj_idx = jnp.minimum(local >> 5, nw - 2)
    s = jnp.minimum(local - (wj_idx << 5), 31).astype(jnp.uint32)

    # register-resident word-pair pick as masked-sum REDUCTIONS over the
    # fetched-words axis (NO gather). A chain of wheres expresses the same
    # pick, but XLA materializes every chain step as a slot-sized HBM temp
    # (~12 x 960 MB at 24k chunks -> OOM); a reduce fuses its masked
    # producer into one pass and only the two outputs exist.
    iota = jnp.arange(nw - 1, dtype=jnp.int32)[None, :, None, None]
    m = wj_idx[:, None, :, :] == iota  # [N, nw-1, gC, WG], fused
    wj = jnp.sum(jnp.where(m, words[:, :-1, None, :], 0), axis=1, dtype=jnp.uint32)
    wj1 = jnp.sum(jnp.where(m, words[:, 1:, None, :], 0), axis=1, dtype=jnp.uint32)

    u = (wj << s) | ((wj1 >> jnp.uint32(1)) >> (jnp.uint32(31) - s))
    wu = wid_slot.astype(jnp.uint32)
    code = ((u >> (jnp.uint32(32) - wu)) & ((jnp.uint32(1) << wu) - 1)).astype(
        jnp.uint8
    )
    # [N, gC, WG] -> slot order ((w*G+grp)*g + t)*C + c
    code = jnp.moveaxis(code, 1, 2).reshape(n, wg * gc)
    return code[:, : frames * c]


def decode_chunks_packed_fn(
    res_bytes: jnp.ndarray,  # uint8[N, B] packed residual section
    sf_codes: jnp.ndarray,  # uint8[N, W, C]
    rs: jnp.ndarray,  # uint8[N, W, C]
    hist0: jnp.ndarray,
    wts0: jnp.ndarray,
    dqt_flat: jnp.ndarray,
    scale_factor_frames: int,
    frames: int,
    residual_size: int,  # static: >0 = CBR constant width; 0 = VBR (widths from rs)
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    max_code_bits: int = 8,  # static: largest VBR residual size in the batch
    matmul_fetch: bool | None = None,  # static: None = follow use_pallas
    fused: bool = True,  # static: False disables the fused Pallas prologs
) -> jnp.ndarray:
    """Full device decode from packed residual bytes -> int16[N, frames, C]."""
    n, w, c = sf_codes.shape
    count = frames * c
    fused_enabled = use_pallas and fused
    sfb = int(np.log2(dqt_flat.shape[0] // (8 * 256)))
    if residual_size and fused_enabled:
        from .pallas_dequant import decode_chunks_packed_fused, fused_prolog_supported
        from .pallas_fused_decode import (
            decode_chunks_packed_fused_single,
            fused_single_supported,
        )

        if fused_single_supported(residual_size, frames, scale_factor_frames, c):
            # ONE kernel: unpack+dequant+recurrence with the dq stream in
            # VMEM scratch -- measured 1.7x the two-kernel fused path
            # (sustained 54.9 -> 31.9 ms on 1007 Msamples,
            # scripts/exp_fused_single.py; see ops/pallas_fused_decode.py)
            return decode_chunks_packed_fused_single(
                res_bytes, sf_codes, hist0, wts0,
                scale_factor_frames=scale_factor_frames,
                frames=frames,
                residual_size=residual_size,
                sfb=sfb,
                interpret=pallas_interpret,
            )
        if fused_prolog_supported(residual_size, frames, scale_factor_frames, c):
            # two-kernel fallback: Pallas unpack+dequant prolog into the
            # lane-major recurrence kernel, dq through HBM -- for
            # geometries whose dq scratch exceeds the single kernel's
            # VMEM bound (see fused_single_supported)
            return decode_chunks_packed_fused(
                res_bytes, sf_codes, hist0, wts0,
                scale_factor_frames=scale_factor_frames,
                frames=frames,
                residual_size=residual_size,
                sfb=sfb,
                interpret=pallas_interpret,
            )
    if (
        not residual_size
        and fused_enabled
        and (matmul_fetch is None or matmul_fetch)
    ):
        from .pallas_fused_decode import (
            decode_chunks_packed_fused_vbr_single,
            fused_vbr_single_supported,
        )

        if fused_vbr_single_supported(
            frames, scale_factor_frames, c, res_bytes.shape[1], max_code_bits
        ):
            # MXU neighborhood fetch + ONE Pallas kernel (extract + dequant
            # + recurrence, dq in VMEM scratch) -- the VBR analog of the
            # single-kernel CBR path (scripts/exp_fused_single.py)
            return decode_chunks_packed_fused_vbr_single(
                res_bytes, sf_codes, rs, hist0, wts0,
                scale_factor_frames=scale_factor_frames,
                frames=frames,
                sfb=sfb,
                max_code_bits=max_code_bits,
                interpret=pallas_interpret,
            )
    if residual_size:
        codes = unpack_const_strided(res_bytes, residual_size, count)
    else:
        # windowed unpack: one fetched span per g-frame group instead of
        # one gather element per code; on TPU the span fetch itself runs as
        # a one-hot matmul on the MXU (dynamic gathers are ~13 ns/element).
        # matmul_fetch defaults to the TPU-ness proxy use_pallas but is its
        # own knob (it is an MXU dot, not a Pallas kernel).
        codes = unpack_var_windowed(
            res_bytes,
            rs.astype(jnp.int32),
            scale_factor_frames,
            frames,
            max_code_bits=max_code_bits,
            matmul_fetch=use_pallas if matmul_fetch is None else matmul_fetch,
        )
        # pin the gather output as a flat 2D uint8 array: letting it fuse
        # into the dequant graph made XLA materialize an int32 [N, F, C]
        # intermediate whose T(8,128) layout pads C -> 128 lanes (64x HBM,
        # OOM on corpus batches)
        codes = jax.lax.optimization_barrier(codes)
    return decode_chunks_fn(
        codes.reshape(n, frames, c),
        sf_codes,
        rs,
        hist0,
        wts0,
        dqt_flat,
        scale_factor_frames=scale_factor_frames,
        use_pallas=use_pallas,
        pallas_interpret=pallas_interpret,
        static_rs=residual_size,
    )


_decode_chunks_packed_jit = jax.jit(
    decode_chunks_packed_fn,
    static_argnames=(
        "scale_factor_frames",
        "frames",
        "residual_size",
        "use_pallas",
        "pallas_interpret",
        "max_code_bits",
        "matmul_fetch",
        "fused",
    ),
)


def decode_chunks_packed(*args, **kwargs):
    """Jitted ``decode_chunks_packed_fn``. The ``SEA_FUSED_PROLOG=0``
    kill-switch is read HERE (outside the trace) and passed as the static
    ``fused`` argument, so flipping the env var mid-process selects a
    different compiled program instead of silently hitting the stale jit
    cache entry."""
    if "fused" not in kwargs:
        import os

        kwargs["fused"] = os.environ.get("SEA_FUSED_PROLOG") != "0"
    return _decode_chunks_packed_jit(*args, **kwargs)


def batch_max_code_bits(rs, residual_size: int) -> int:
    """Static VBR span bound for ``decode_chunks_packed``: the batch's
    largest residual size, rounded up to even so the jit cache sees at most
    4 variants. Fixed 8 for CBR so the constant-width path never forks
    compiles; ``rs`` is the host-parsed residual-size array."""
    if residual_size or rs.size == 0:
        return 8
    m = int(rs.max())
    return min(8, m + (m & 1))


def default_use_pallas() -> bool:
    """Pallas kernels run on real TPU backends only (XLA scan elsewhere)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
