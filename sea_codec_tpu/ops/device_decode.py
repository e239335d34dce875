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
    if 9 * s > 512:  # sfb 7..8 (API-only): the chain would out-cost the gather
        sfval = jnp.asarray(sfval_t.reshape(-1))[idx]
    else:
        sfval = _select_chain(idx, sfval_t.reshape(-1), jnp.float32)
    c0 = _select_chain(rs_w, c0_t, jnp.float32)
    stepf = _select_chain(rs_w, stepf_t, jnp.float32)
    endv = _select_chain(rs_w, endv_t, jnp.float32)
    kmax = _select_chain(rs_w, kmax_t, jnp.int32)
    return sfval, c0, stepf, endv, kmax


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
    n, f, c = codes.shape
    w = sf_codes.shape[1]
    n_sf = dqt_flat.shape[0] // (8 * 256)
    assert w * scale_factor_frames >= f
    sfb = int(np.log2(n_sf))

    # Design note: a fused kernel that dequantizes *inside* the Pallas LMS
    # kernel (cutting the [N, F, C] int32 dq intermediate out of HBM) was
    # built and measured bit-exact but ~1.9x SLOWER end to end on v5e,
    # invariant under const-load hoisting and a vectorized dequant phase
    # into VMEM scratch -- the XLA prolog + plain recurrence kernel below is
    # the faster split, so it stays.

    # Per-window dequantization constants via fused select chains (NO
    # gathers -- see _select_chain), then the per-sample dequantized value
    # computed *arithmetically* -- a [N, F, C]-sized table gather here would
    # dominate the whole decode (XLA TPU gathers are ~ns/element).
    # The closed forms reproduce the table build exactly (see FORMAT.md and
    # ops/pallas_encode.py); bit-equality with the gather path is tested.
    sf_w = sf_codes.astype(jnp.int32)
    rs_w = rs.astype(jnp.int32)
    sfval_win, c0_win, stepf_win, endv_win, kmax_win = _dequant_window_constants(
        sf_w, rs_w, sfb, static_rs
    )

    # Window-blocked broadcast: reshape codes to [N, W, sff, C] so the
    # per-window constants broadcast along the sff axis in-register. (The
    # previous jnp.repeat-based per-frame expansion materialized five
    # [N, F, C] repeat gathers and dominated the whole decode: 168 of
    # 218 ms on the 252-Msample bench shape; this form is ~an order of
    # magnitude cheaper with bit-identical results.)
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
    dq = dq.reshape(n, fp, c)[:, :f]

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
) -> jnp.ndarray:
    """Full device decode from packed residual bytes -> int16[N, frames, C]."""
    n, w, c = sf_codes.shape
    count = frames * c
    if residual_size:
        codes = unpack_const_strided(res_bytes, residual_size, count)
    else:
        # flat 2D reshape: a [N, *, C] intermediate would tile-pad the minor
        # dim C -> 128 (64x HBM inflation at C=2)
        sff = scale_factor_frames
        widths = (
            jnp.broadcast_to(rs.astype(jnp.int32)[:, :, None, :], (n, w, sff, c))
            .reshape(n, w * sff * c)[:, :count]
        )
        codes = unpack_var_device(res_bytes, widths)
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


decode_chunks_packed = jax.jit(
    decode_chunks_packed_fn,
    static_argnames=(
        "scale_factor_frames",
        "frames",
        "residual_size",
        "use_pallas",
        "pallas_interpret",
    ),
)


def default_use_pallas() -> bool:
    """Pallas kernels run on real TPU backends only (XLA scan elsewhere)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
