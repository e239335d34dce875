"""Fused CBR unpack+dequant Pallas kernel (the decode prolog).

The XLA prolog (constant-width unpack -> dequant -> lane transpose) moves
~4-5 GB of HBM per 0.5 Gsample batch across materialized intermediates and
measured 95 ms of the 108 ms device decode (scripts/perf_decode_attribution
.py). This kernel computes the lane-major int16 dq stream straight from the
byte-transposed bitstream in one pass, using only Mosaic-friendly
primitives -- no gathers, no dynamic indexing:

- **Layout**: bytes on sublanes, chunks on lanes (``resT[j, n]`` = byte j
  of chunk n, pre-transposed by XLA; widened in-register). The output
  rows are code-major (``i = frame*C + ch``), which reshapes *for free* to
  the ``[F, C*Npad]`` lane-major form the LMS recurrence kernel consumes.
- **16-bit windows everywhere at once**: ``w16 = (v << 8) | roll(v, -1)``
  -- one sublane roll (the same static-rotate trick as the encode kernel's
  sample loop) gives every byte's sliding window simultaneously.
- **Static periodicity instead of indexing**: an rs-bit stream repeats
  every 8 codes / rs bytes, so the code->window mapping is a reshape
  ``[G, rs, N]`` + 8 static middle-dim picks + a stack -- a fixed shuffle
  pattern, never a gather. Per-row shift amounts come from an iota.
- **Scale factors by broadcast**: blocks cover whole scale-factor windows
  (``m`` windows of ``sff*C`` codes each), so the per-(window, channel)
  f32 scale factors expand by broadcast+reshape, not repeat-gathers.

Bit-exact vs ops.device_decode.dequant_codes (same closed-form f32 curve
math); tested against it in tests/test_pallas.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables

LANES = 512  # chunk lanes per block


def _plan_blocks(w: int, sff: int, c: int, rs: int):
    """(m windows per block, padded W) with integer bytes per block and
    8-aligned output rows; block sizes bounded for VMEM."""
    m0 = 8 // math.gcd(sff * c, 8)
    while (m0 * sff * c * rs) % 8:
        m0 *= 2
    m = m0
    # grow toward ~256-512 output rows per block while m divides (padded) W
    while 2 * m * sff * c <= 512 and (m * 2 * sff * c * rs) // 8 <= 256:
        m *= 2
    wp = -(-w // m) * m
    return m, wp


def _make_dequant_kernel(rs: int, sff: int, c: int, m: int, sfb: int):
    g8 = 8  # codes per byte-period
    out_rows = m * sff * c
    brows = out_rows * rs // 8
    ng = brows // rs

    # static per-(rs) dequant constants as PYTHON scalars (closed-form
    # curve, dqt.rs:75-126; single source: tables.rs_curve_constants);
    # jnp scalars here would be captured constants
    c0_v, stepf_v, endv_v, kmax_v = tables.rs_curve_constants(rs)

    def kernel(v_ref, sfv_ref, out_ref):
        mask = jnp.int32((1 << rs) - 1)
        c0 = jnp.float32(c0_v)
        endv = jnp.float32(endv_v)
        stepf = jnp.float32(stepf_v)
        kmax = jnp.int32(kmax_v)
        # [Brows, LANES] bytes; widened in-register (shipping the plane as
        # uint8 quarters the transpose-pass write and the kernel's input
        # traffic vs a pre-widened int32 plane)
        v = v_ref[...].astype(jnp.int32)
        w16 = (v << jnp.int32(8)) | jnp.concatenate([v[1:], v[:1]], axis=0)
        wg = w16.reshape(ng, rs, LANES)
        picks = [wg[:, (r * rs) // 8] for r in range(g8)]  # 8 x [G, LANES]
        rep = jnp.stack(picks, axis=1).reshape(ng * g8, LANES)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANES), 0) & jnp.int32(7)
        sh = jnp.int32(16 - rs) - ((r8 * jnp.int32(rs)) & jnp.int32(7))
        q = jax.lax.shift_right_logical(rep, sh) & mask

        sfv = sfv_ref[...]  # [m, C, LANES] f32
        sfv_rep = jnp.broadcast_to(
            sfv[:, None, :, :], (m, sff, c, LANES)
        ).reshape(out_rows, LANES)

        k = q >> jnp.int32(1)
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepf
        curve = jnp.where(k == kmax, endv, curve)
        curve = jnp.where(k == jnp.int32(0), c0, curve)
        dq = jnp.floor(sfv_rep * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((q & jnp.int32(1)) == jnp.int32(1), -dq, dq)
        out_ref[...] = dq.astype(jnp.int16)

    return kernel, brows, out_rows


@partial(
    jax.jit,
    static_argnames=("rs", "sff", "c", "m", "sfb", "interpret"),
)
def unpack_dequant_cbr_lanes(
    resT: jnp.ndarray,  # uint8[Bpad, Npad] byte-transposed residual bytes
    sfvalT: jnp.ndarray,  # f32[Wpad, C, Npad] per-(window, channel) scale factors
    rs: int,
    sff: int,
    c: int,
    m: int,
    sfb: int,
    interpret: bool = False,
) -> jnp.ndarray:  # int16[Wpad*sff*C, Npad] lane-major dq rows (code-major)
    bpad, npad = resT.shape
    wp = sfvalT.shape[0]
    kernel, brows, out_rows = _make_dequant_kernel(rs, sff, c, m, sfb)
    assert bpad == (wp // m) * brows and npad % LANES == 0
    grid = (wp // m, npad // LANES)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((wp * sff * c, npad), jnp.int16),
        in_specs=[
            pl.BlockSpec((brows, LANES), lambda rb, nb: (rb, nb), memory_space=pltpu.VMEM),
            # rb * 0, not a literal 0: under jax_enable_x64 a Python 0 turns
            # the index tuple i64, which Mosaic cannot legalize
            pl.BlockSpec((m, c, LANES), lambda rb, nb: (rb, rb * 0, nb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda rb, nb: (rb, nb), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(resT, sfvalT)


def fused_prolog_supported(residual_size: int, frames: int, sff: int, c: int) -> bool:
    """CBR only, whole scale-factor windows only (block planning pads the
    window count; ragged-window chunks fall back to the XLA prolog), and
    the planner's BASE block must fit the grow loop's VMEM targets -- for
    high sff*c (e.g. 128 channels) even m0=1 exceeds them, so those
    configs stay on the XLA prolog instead of busting VMEM."""
    if not (residual_size > 0 and frames % sff == 0 and c >= 1):
        return False
    m, _wp = _plan_blocks(frames // sff, sff, c, residual_size)
    out_rows = m * sff * c
    return out_rows <= 512 and out_rows * residual_size // 8 <= 256


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "frames",
        "residual_size",
        "sfb",
        "interpret",
        "lane_output",
    ),
)
def decode_chunks_packed_fused(
    res_bytes: jnp.ndarray,  # uint8[N, B] packed residual section
    sf_codes: jnp.ndarray,  # uint8[N, W, C]
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    scale_factor_frames: int,
    frames: int,
    residual_size: int,
    sfb: int,
    interpret: bool = False,
    lane_output: bool = False,  # True: return int16[F, C*Npad] lane-major
    # PCM (lane = ch*Npad + chunk) without the [N, F, C] transpose -- for
    # on-device consumers that read the recurrence kernel's native layout
) -> jnp.ndarray:  # int16[N, F, C] (or lane-major, see above)
    """Full CBR device decode with the fused Pallas prolog.

    bytes -> (XLA transpose+widen) -> fused unpack+dequant kernel ->
    lane-major LMS recurrence kernel -> [N, F, C] PCM. The dq stream never
    exists in chunk-major form and the uint8 code plane never exists at
    all."""
    from .device_decode import _dequant_window_constants

    n, w, c = sf_codes.shape
    sff = scale_factor_frames
    rs = residual_size
    m, wp = _plan_blocks(w, sff, c, rs)
    npad = -(-n // LANES) * LANES
    btot = (wp // m) * ((m * sff * c * rs) // 8)

    # byte-transpose + widen in one fused XLA pass; pad rows/lanes with zeros
    resT = jnp.zeros((btot, npad), jnp.uint8)
    breal = min(res_bytes.shape[1], btot)
    resT = resT.at[:breal, :n].set(res_bytes[:, :breal].T)

    # per-(window, channel) scale-factor values, transposed to [Wp, C, Npad]
    sfval_win, _c0, _stepf, _endv, _kmax = _dequant_window_constants(
        sf_codes.astype(jnp.int32), jnp.full((n, w, c), rs, jnp.int32), sfb, rs
    )
    sfvalT = jnp.zeros((wp, c, npad), jnp.float32)
    sfvalT = sfvalT.at[:w, :, :n].set(jnp.transpose(sfval_win, (1, 2, 0)))

    dq_rows = unpack_dequant_cbr_lanes(
        resT, sfvalT, rs=rs, sff=sff, c=c, m=m, sfb=sfb, interpret=interpret
    )  # [Wp*sff*C, Npad] rows are code-major (frame-major, channel-minor)

    return _recurrence_lanes(
        dq_rows, hist0, wts0, c=c, n=n, npad=npad, fp=wp * sff,
        frames=frames, interpret=interpret, lane_output=lane_output,
    )


def _plan_vbr_blocks(wg: int, gc: int, nw: int):
    """(mw window-groups per block, padded WG) with 8-aligned output rows
    and block sizes bounded for VMEM: out block = mw*gc rows x LANES i16,
    words block = mw*nw rows x LANES i32 (without the input bound, small
    gc -- e.g. mono with a prime sff > 40 -> gc=1 -- would grow mw to 512
    and bust VMEM on the words block alone)."""
    mw = 8 // math.gcd(gc, 8)
    while 2 * mw * gc <= 512 and 2 * mw * nw * LANES * 4 <= (1 << 21):
        mw *= 2
    wgp = -(-wg // mw) * mw
    return mw, wgp


def _make_vbr_dequant_kernel(nw: int, g: int, c: int, mw: int, sfb: int):
    """Fused VBR extraction+dequant kernel body.

    Inputs are the matmul-fetched word neighborhoods (lane-major: chunks on
    lanes) plus per-(window-group[, channel]) metadata planes. Within one
    scale-factor window, code bit offsets are AFFINE in (frame, channel)
    (chunk.rs:245-252 layout), so each row's word pair is picked by a
    static nw-deep compare/select over the fetched neighborhood -- register
    work, no gather. The dequant curve constants are derived from each
    row's residual size by 8-entry select chains over Python scalars.
    """
    from . import tables

    gc = g * c
    out_rows = mw * gc
    # single-source curve constants (tables.rs_curve_constants), per rs 1..8
    consts = {r: tables.rs_curve_constants(r) for r in range(1, 9)}
    c0_t = {r: consts[r][0] for r in consts}
    stepf_t = {r: consts[r][1] for r in consts}
    endv_t = {r: consts[r][2] for r in consts}
    kmax_t = {r: consts[r][3] for r in consts}

    def chain(wid, t, dtype):
        acc = jnp.full(wid.shape, t[1], dtype)
        for r in range(2, 9):
            acc = jnp.where(wid == r, dtype(t[r]), acc)
        return acc

    def kernel(words_ref, phase_ref, wsum_ref, wid_ref, pre_ref, sfv_ref, out_ref):
        shr = jax.lax.shift_right_logical
        words = words_ref[...]  # [mw, nw, LANES] int32 big-endian words
        # per-(group, channel) planes -> per-row [out_rows, LANES] by
        # broadcast along the frame-in-group axis (rows are (grp, t, ch))
        expand_c = lambda a: jnp.broadcast_to(
            a[:, None, :, :], (mw, g, c, LANES)
        ).reshape(out_rows, LANES)
        expand_g = lambda a: jnp.broadcast_to(
            a[:, None, :], (mw, gc, LANES)
        ).reshape(out_rows, LANES)
        wid_r = expand_c(wid_ref[...])  # int32 residual size per row
        pre_r = expand_c(pre_ref[...])  # int32 channel bit prefix
        sfv_r = expand_c(sfv_ref[...])  # f32 scale-factor value
        phase_r = expand_g(phase_ref[...])  # int32 bit phase in neighborhood
        wsum_r = expand_g(wsum_ref[...])  # int32 bits per frame in window
        t_r = jax.lax.broadcasted_iota(
            jnp.int32, (mw, g, c, LANES), 1
        ).reshape(out_rows, LANES)  # frame index within the group

        local = phase_r + t_r * wsum_r + pre_r
        idx = jnp.minimum(local >> jnp.int32(5), jnp.int32(nw - 2))
        s = jnp.minimum(local - (idx << jnp.int32(5)), jnp.int32(31))

        # word-pair pick: static compare/select over the neighborhood depth
        wj = jnp.zeros((out_rows, LANES), jnp.int32)
        wj1 = jnp.zeros((out_rows, LANES), jnp.int32)
        for j in range(nw - 1):
            m = idx == jnp.int32(j)
            # slice-then-newaxis: words[:, None, j, :] mixes None with an
            # integer index, which jnp routes through gather (unsupported >2D
            # in Mosaic); the static middle-dim pick itself is fine
            wa = jnp.broadcast_to(
                words[:, j, :][:, None, :], (mw, gc, LANES)
            ).reshape(out_rows, LANES)
            wb = jnp.broadcast_to(
                words[:, j + 1, :][:, None, :], (mw, gc, LANES)
            ).reshape(out_rows, LANES)
            wj = jnp.where(m, wa, wj)
            wj1 = jnp.where(m, wb, wj1)

        u = (wj << s) | shr(shr(wj1, jnp.int32(1)), jnp.int32(31) - s)
        code = shr(u, jnp.int32(32) - wid_r) & ((jnp.int32(1) << wid_r) - 1)

        c0 = chain(wid_r, c0_t, jnp.float32)
        stepf = chain(wid_r, stepf_t, jnp.float32)
        endv = chain(wid_r, endv_t, jnp.float32)
        kmax = chain(wid_r, kmax_t, jnp.int32)
        k = code >> jnp.int32(1)
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepf
        curve = jnp.where(k == kmax, endv, curve)
        curve = jnp.where(k == jnp.int32(0), c0, curve)
        dq = jnp.floor(sfv_r * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((code & jnp.int32(1)) == jnp.int32(1), -dq, dq)
        out_ref[...] = dq.astype(jnp.int16)

    return kernel, out_rows


@partial(
    jax.jit,
    static_argnames=("nw", "g", "c", "mw", "sfb", "interpret"),
)
def unpack_dequant_vbr_lanes(
    words: jnp.ndarray,  # int32[WGp, nw, Npad] fetched word neighborhoods
    phase: jnp.ndarray,  # int32[WGp, Npad] group bit phase in neighborhood
    wsum: jnp.ndarray,  # int32[WGp, Npad] bits per frame in window
    wid: jnp.ndarray,  # int32[WGp, C, Npad] per-channel residual sizes
    pre: jnp.ndarray,  # int32[WGp, C, Npad] per-channel bit prefixes
    sfv: jnp.ndarray,  # f32[WGp, C, Npad] per-channel scale-factor values
    nw: int,
    g: int,
    c: int,
    mw: int,
    sfb: int,
    interpret: bool = False,
) -> jnp.ndarray:  # int16[WGp*g*C, Npad] lane-major dq rows (code-major)
    wgp, _, npad = words.shape
    kernel, out_rows = _make_vbr_dequant_kernel(nw, g, c, mw, sfb)
    assert wgp % mw == 0 and npad % LANES == 0
    grid = (wgp // mw, npad // LANES)
    z = lambda rb: rb * 0  # rb * 0, not 0: x64 literal breaks Mosaic indexing
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((wgp * g * c, npad), jnp.int16),
        in_specs=[
            pl.BlockSpec((mw, nw, LANES), lambda rb, nb: (rb, z(rb), nb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mw, LANES), lambda rb, nb: (rb, nb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mw, LANES), lambda rb, nb: (rb, nb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mw, c, LANES), lambda rb, nb: (rb, z(rb), nb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mw, c, LANES), lambda rb, nb: (rb, z(rb), nb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mw, c, LANES), lambda rb, nb: (rb, z(rb), nb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda rb, nb: (rb, nb), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(words, phase, wsum, wid, pre, sfv)


def fused_vbr_supported(
    frames: int, sff: int, c: int, res_len: int, max_code_bits: int = 8
) -> bool:
    """Whole scale-factor windows only, and the matmul fetch's row bound
    (beyond it the one-hot contraction outgrows its advantage). Uses the
    SAME geometry as the XLA path's ``bw <= 32768`` gate."""
    from .device_decode import _group_frames, _vbr_fetch_geometry

    gc = _group_frames(sff, c) * c
    bw, _k1, _nw, _need = _vbr_fetch_geometry(res_len, gc, max_code_bits)
    return frames % sff == 0 and c >= 1 and bw <= 32768


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "frames",
        "sfb",
        "max_code_bits",
        "interpret",
        "lane_output",
    ),
)
def decode_chunks_packed_fused_vbr(
    res_bytes: jnp.ndarray,  # uint8[N, B] packed residual section
    sf_codes: jnp.ndarray,  # uint8[N, W, C]
    rs: jnp.ndarray,  # uint8[N, W, C] per-window residual sizes (1..8)
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    scale_factor_frames: int,
    frames: int,
    sfb: int,
    max_code_bits: int = 8,
    interpret: bool = False,
    lane_output: bool = False,
) -> jnp.ndarray:  # int16[N, F, C] (or lane-major, see CBR variant)
    """Full VBR device decode with the fused Pallas extraction+dequant.

    bytes -> one-hot MXU neighborhood fetch (lane-major words) -> fused
    Pallas extract+dequant kernel -> lane-major LMS recurrence -> PCM.
    Replaces the XLA select-chain extraction + dequant passes whose HBM
    temps dominated the VBR decode (scripts/perf_vbr_attribution.py:
    prolog 228 of 249 ms at 503 Msamples)."""
    from .device_decode import (
        _dequant_window_constants,
        _fetch_neighborhood_matmul,
        _vbr_fetch_geometry,
        _vbr_group_addressing,
    )

    n, w, c = sf_codes.shape
    sff = scale_factor_frames
    b = res_bytes.shape[1]
    rs32 = rs.astype(jnp.int32)
    # group addressing + fetch geometry SHARED with unpack_var_windowed
    g, n_groups, wg, gc, wsum, prefix, gstart = _vbr_group_addressing(
        rs32, frames, sff, c
    )
    _bw, k1, nw, need = _vbr_fetch_geometry(b, gc, max_code_bits)
    mw, wgp = _plan_vbr_blocks(wg, gc, nw)
    npad = -(-n // LANES) * LANES

    base8 = jnp.minimum(gstart >> 8, k1 - 1)  # [N, WG]
    phase = gstart - (base8 << 8)
    words_t = _fetch_neighborhood_matmul(
        jnp.pad(res_bytes, ((0, 0), (0, need - b))), base8, k1, nw,
        transposed=True,
    ).astype(jnp.int32)  # [WG, nw, N]

    # --- lane-major metadata planes, padded to [WGp(, C), Npad]; the pad
    # copy is skipped entirely when the shapes already align (the corpus
    # batch shapes do: N a multiple of LANES, WG a multiple of mw)
    exact = wgp == wg and npad == n

    def pad2(a, shape):
        return a if exact else jnp.zeros(shape, a.dtype).at[
            tuple(slice(s) for s in a.shape)
        ].set(a)

    pad_g = lambda a: pad2(a.T, (wgp, npad))
    expand_wg = lambda a: jnp.broadcast_to(
        a[:, :, None], (n, w, n_groups)
    ).reshape(n, wg)
    words_p = pad2(words_t, (wgp, nw, npad))
    phase_p = pad_g(phase)
    wsum_p = pad_g(expand_wg(wsum))

    def pad_c(a):  # [N, W, C] -> [WGp, C, Npad] (windows expanded to groups)
        a_wg = jnp.broadcast_to(
            a[:, :, None, :], (n, w, n_groups, c)
        ).reshape(n, wg, c)
        return pad2(jnp.transpose(a_wg, (1, 2, 0)), (wgp, c, npad))

    sfval_win, _c0, _stepf, _endv, _kmax = _dequant_window_constants(
        sf_codes.astype(jnp.int32), rs32, sfb, 0
    )
    wid_p = pad_c(rs32)
    pre_p = pad_c(prefix)
    sfv_p = pad_c(sfval_win)

    dq_rows = unpack_dequant_vbr_lanes(
        words_p, phase_p, wsum_p, wid_p, pre_p, sfv_p,
        nw=nw, g=g, c=c, mw=mw, sfb=sfb, interpret=interpret,
    )  # [WGp*g*C, Npad] code-major rows

    return _recurrence_lanes(
        dq_rows, hist0, wts0, c=c, n=n, npad=npad, fp=wgp * g,
        frames=frames, interpret=interpret, lane_output=lane_output,
    )


def _recurrence_lanes(
    dq_rows: jnp.ndarray,  # int16[fp*C, Npad] code-major dq rows
    hist0: jnp.ndarray,
    wts0: jnp.ndarray,
    c: int,
    n: int,
    npad: int,
    fp: int,
    frames: int,
    interpret: bool,
    lane_output: bool,
) -> jnp.ndarray:
    """Shared epilogue of the fused decode paths: lane-pack the LMS state,
    run the lane-major recurrence kernel, slice/transpose the PCM out."""
    from .pallas_decode import _lms_decode_lanes_interpret, lms_decode_lanes

    dq_l = dq_rows.reshape(fp, c * npad)  # lane = ch * Npad + n_chunk

    # LMS state in the same channel-major lane order (padding lanes: zero
    # state, decoded garbage sliced off below)
    state = jnp.concatenate([hist0, wts0], axis=-1)  # [N, C, 8]
    state_t = jnp.pad(
        jnp.transpose(state, (1, 0, 2)), ((0, 0), (0, npad - n), (0, 0))
    )  # [C, Npad, 8]
    lms_l = state_t.reshape(c * npad, 8).T  # [8, C*Npad]

    b = c * npad
    s_sub = 32 if b > 2048 else 8
    lane_block = s_sub * 128
    b_pad = -(-b // lane_block) * lane_block
    tb_max = 4096 // s_sub  # VMEM: tb * s_sub * 128 B in+out, double-buffered
    tb = next((t for t in (512, 256, 128) if t <= tb_max and fp % t == 0), 0)
    if tb == 0:
        tb = min(128, tb_max)
    f_pad = -(-fp // tb) * tb
    if (f_pad, b_pad) != (fp, b):
        dq_l = jnp.zeros((f_pad, b_pad), jnp.int16).at[:fp, :b].set(dq_l)
        lms_l = jnp.zeros((8, b_pad), jnp.int32).at[:, :b].set(lms_l)
    r = b_pad // 128
    if interpret:
        out = _lms_decode_lanes_interpret(
            dq_l.reshape(f_pad, r, 128), lms_l.reshape(8, r, 128),
            time_block=tb, sublanes=s_sub,
        )
    else:
        out = lms_decode_lanes(
            dq_l.reshape(f_pad, r, 128), lms_l.reshape(8, r, 128),
            time_block=tb, sublanes=s_sub,
        )
    out = out.reshape(f_pad, b_pad)[:frames, : c * npad]
    if lane_output:
        return out
    return out.reshape(frames, c, npad)[:, :, :n].transpose(2, 0, 1)
