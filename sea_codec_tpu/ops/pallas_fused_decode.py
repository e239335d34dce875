"""Single-kernel CBR decode: unpack + dequant + LMS recurrence, one pass.

The two-kernel fused path (``pallas_dequant`` prolog -> ``pallas_decode``
recurrence) materializes the int16 dq stream in HBM between the kernels —
4 GB of round-trip traffic per Gsample (~5-7 ms of the ~51 ms device
decode). This kernel keeps dq in VMEM scratch and runs the recurrence in
the same grid step.

The layout trick that makes the fusion free (no in-kernel relayouts): the
chunk axis is split ``chunk = g*128 + lane`` with the 128 lanes on the
minor axis and the group index g on a SECOND-minor/leading axis. All
prolog arrays are ``[rows, G, 128]`` (byte/code rows leading) and all
recurrence state is ``[C, G, 128]`` — a per-frame slice of the dq scratch
``dq[f*C:(f+1)*C]`` is already the recurrence's plane shape; flattening
``(C, G)`` is a leading-axis reshape, i.e. a no-op on the tiled layout.
Host-side, ``[btot, npad] -> [btot, gt, 128]`` and friends are free
row-major reshapes of the existing transposed planes.

Grid: (chunk-group blocks: parallel/megacore, window row-blocks:
sequential). LMS state lives in VMEM scratch across row-blocks, exactly
like the standalone recurrence kernel's time grid.

Bit-exact vs the two-kernel path (same closed-form f32 curve math, same
int recurrence); tested in tests/test_pallas_fused.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables
from .pallas_dequant import _plan_blocks

G_SUB = 16  # chunk groups per block: G_SUB * 128 = 2048 chunks / grid step


def _make_fused_kernel(rs: int, sff: int, c: int, m: int, packed32: bool = False):
    g8 = 8
    out_rows = m * sff * c
    brows = out_rows * rs // 8
    ng = brows // rs
    frames_blk = m * sff
    c0_v, stepf_v, endv_v, kmax_v = tables.rs_curve_constants(rs)

    def kernel(lms_ref, v_ref, sfv_ref, out_ref, dq_scratch, h_scratch, w_scratch):
        rb = pl.program_id(1)

        @pl.when(rb == 0)
        def _():
            h_scratch[:] = lms_ref[0:4]
            w_scratch[:] = lms_ref[4:8]

        # ---- phase 1: unpack + dequant into VMEM scratch (never HBM) ----
        mask = jnp.int32((1 << rs) - 1)
        if packed32:
            # bytes arrive 4-per-int32 (little-endian bitcast): the host
            # transpose shuffles 4x fewer elements, and the byte rows are
            # rebuilt here with 2 vector ops per row
            v32 = v_ref[...]  # int32 [brows//4, G, 128]
            v = jnp.stack(
                [
                    jax.lax.shift_right_logical(v32, jnp.int32(8 * j))
                    & jnp.int32(255)
                    for j in range(4)
                ],
                axis=1,
            ).reshape(brows, G_SUB, 128)
        else:
            v = v_ref[...].astype(jnp.int32)  # [brows, G, 128]
        w16 = (v << jnp.int32(8)) | jnp.concatenate([v[1:], v[:1]], axis=0)
        wg = w16.reshape(ng, rs, G_SUB, 128)
        picks = [wg[:, (r * rs) // 8] for r in range(g8)]  # 8 x [ng, G, 128]
        rep = jnp.stack(picks, axis=1).reshape(out_rows, G_SUB, 128)
        r8 = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, G_SUB, 128), 0
        ) & jnp.int32(7)
        sh = jnp.int32(16 - rs) - ((r8 * jnp.int32(rs)) & jnp.int32(7))
        q = jax.lax.shift_right_logical(rep, sh) & mask

        sfv = sfv_ref[...]  # [m, C, G, 128] f32
        sfv_rep = jnp.broadcast_to(
            sfv[:, None, :, :, :], (m, sff, c, G_SUB, 128)
        ).reshape(out_rows, G_SUB, 128)

        k = q >> jnp.int32(1)
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * jnp.float32(stepf_v)
        curve = jnp.where(k == jnp.int32(kmax_v), jnp.float32(endv_v), curve)
        curve = jnp.where(k == jnp.int32(0), jnp.float32(c0_v), curve)
        dq = jnp.floor(sfv_rep * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((q & jnp.int32(1)) == jnp.int32(1), -dq, dq)
        dq_scratch[...] = dq.astype(jnp.int16)

        # ---- phase 2: LMS recurrence over this block's frames ----
        i16_min = jnp.int32(-32768)
        i16_max = jnp.int32(32767)

        def body(f, carry):
            h0, h1, h2, h3, w0, w1, w2, w3 = carry
            dq_f = dq_scratch[pl.ds(f * c, c)].astype(jnp.int32)  # [C, G, 128]
            pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> jnp.int32(13)
            recon = jnp.minimum(jnp.maximum(pred + dq_f, i16_min), i16_max)
            out_ref[f] = recon.astype(jnp.int16)
            delta = dq_f >> jnp.int32(4)
            w0 = w0 + jnp.where(h0 < 0, -delta, delta)
            w1 = w1 + jnp.where(h1 < 0, -delta, delta)
            w2 = w2 + jnp.where(h2 < 0, -delta, delta)
            w3 = w3 + jnp.where(h3 < 0, -delta, delta)
            return (h1, h2, h3, recon, w0, w1, w2, w3)

        carry0 = (
            h_scratch[0], h_scratch[1], h_scratch[2], h_scratch[3],
            w_scratch[0], w_scratch[1], w_scratch[2], w_scratch[3],
        )
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(frames_blk), body, carry0
        )
        for i in range(4):
            h_scratch[i] = carry[i]
            w_scratch[i] = carry[4 + i]

    return kernel, brows, out_rows, frames_blk


@partial(jax.jit, static_argnames=("rs", "sff", "c", "m", "interpret", "packed32"))
def decode_cbr_fused_single(
    resT3: jnp.ndarray,  # uint8[Bpad, GT, 128] byte rows x chunk groups x
    # lanes, or int32[Bpad//4, GT, 128] little-endian packed (packed32=True)
    sfvalT3: jnp.ndarray,  # f32[Wpad, C, GT, 128]
    lms3: jnp.ndarray,  # int32[8, C, GT, 128] planes h0..h3, w0..w3
    rs: int,
    sff: int,
    c: int,
    m: int,
    interpret: bool = False,
    packed32: bool = False,
) -> jnp.ndarray:  # int16[Wpad*sff, C, GT, 128] PCM, frame-major
    rdiv = 4 if packed32 else 1
    bpad, gt, _ = resT3.shape
    wp = sfvalT3.shape[0]
    kernel, brows, out_rows, frames_blk = _make_fused_kernel(
        rs, sff, c, m, packed32=packed32
    )
    assert bpad * rdiv == (wp // m) * brows and gt % G_SUB == 0
    brows //= rdiv
    grid = (gt // G_SUB, wp // m)
    z = lambda i: i * 0  # literal 0 breaks Mosaic indexing under x64
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((wp * sff, c, gt, 128), jnp.int16),
        in_specs=[
            pl.BlockSpec(
                (8, c, G_SUB, 128), lambda gb, rb: (z(rb), z(rb), gb, z(rb)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (brows, G_SUB, 128), lambda gb, rb: (rb, gb, z(rb)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, c, G_SUB, 128), lambda gb, rb: (rb, z(rb), gb, z(rb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (frames_blk, c, G_SUB, 128), lambda gb, rb: (rb, z(rb), gb, z(rb)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((out_rows, G_SUB, 128), jnp.int16),
            pltpu.VMEM((4, c, G_SUB, 128), jnp.int32),
            pltpu.VMEM((4, c, G_SUB, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lms3, resT3, sfvalT3)


MAX_OUT_ROWS = 320  # scoped-VMEM kernel-stack bound: the unpack/dequant
# phase keeps ~4-5 [out_rows, G_SUB, 128] i32/f32 temps live, and 480 rows
# (the c=3 geometry of _plan_blocks) measured 16.88 MB > the 16 MB v5e
# limit on hardware; 320 rows (c=2 at rs up to 8, the bench sweep) fits.


def _plan_single(w: int, sff: int, c: int, rs: int):
    """_plan_blocks, then halve m while the block would blow the kernel's
    scoped-VMEM stack (keeping the byte-alignment invariant)."""
    m, wp = _plan_blocks(w, sff, c, rs)
    while (
        m * sff * c > MAX_OUT_ROWS
        and m % 2 == 0
        and ((m // 2) * sff * c * rs) % 8 == 0
    ):
        m //= 2
    return m, -(-w // m) * m


def fused_single_supported(
    residual_size: int, frames: int, sff: int, c: int
) -> bool:
    """Same block-planning gate as the two-kernel fused path, plus the
    VMEM bounds of this kernel (dq scratch + out block + unpack temps)."""
    from .pallas_dequant import fused_prolog_supported

    if not fused_prolog_supported(residual_size, frames, sff, c):
        return False
    m, _wp = _plan_single(frames // sff, sff, c, residual_size)
    out_rows = m * sff * c
    if out_rows > MAX_OUT_ROWS:
        return False
    # dq scratch (i16) + out block (i16, double-buffered) per grid step
    vmem = out_rows * G_SUB * 128 * 2 * 3
    return vmem <= (1 << 23)


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames", "frames", "residual_size", "sfb",
        "interpret", "lane_output",
    ),
)
def decode_chunks_packed_fused_single(
    res_bytes: jnp.ndarray,  # uint8[N, B] packed residual section
    sf_codes: jnp.ndarray,  # uint8[N, W, C]
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    scale_factor_frames: int,
    frames: int,
    residual_size: int,
    sfb: int,
    interpret: bool = False,
    lane_output: bool = False,
) -> jnp.ndarray:  # int16[N, F, C] (or lane-major [F, C*Npad])
    """Full CBR device decode in ONE Pallas kernel (plus the XLA byte
    transpose and the PCM epilog). Same host-side staging as
    ``decode_chunks_packed_fused``; the dq stream never exists outside
    VMEM."""
    from .device_decode import _dequant_window_constants

    n, w, c = sf_codes.shape
    sff = scale_factor_frames
    rs = residual_size
    m, wp = _plan_single(w, sff, c, rs)
    lane_block = G_SUB * 128
    npad = -(-n // lane_block) * lane_block
    gt = npad // 128
    btot = (wp // m) * ((m * sff * c * rs) // 8)

    breal = min(res_bytes.shape[1], btot)
    # NOTE: an int32-packed transpose variant (bitcast 4 bytes -> i32, 4x
    # fewer shuffled elements, in-kernel byte re-expansion; kernel path
    # packed32=True) measured SLOWER at bench scale: 48.8 vs 32.5 ms/program
    # sustained (scripts/exp_byte_transpose.py) -- the u8[..,4]->i32 bitcast
    # is itself a minor-axis regrouping relayout that out-costs the saved
    # shuffles. The uint8 plane transpose stays.
    resT = jnp.zeros((btot, npad), jnp.uint8)
    resT = resT.at[:breal, :n].set(res_bytes[:, :breal].T)
    feed = resT.reshape(btot, gt, 128)

    sfval_win, *_ = _dequant_window_constants(
        sf_codes.astype(jnp.int32), jnp.full((n, w, c), rs, jnp.int32), sfb, rs
    )
    sfvalT = jnp.zeros((wp, c, npad), jnp.float32)
    sfvalT = sfvalT.at[:w, :, :n].set(jnp.transpose(sfval_win, (1, 2, 0)))

    state = jnp.concatenate([hist0, wts0], axis=-1)  # [N, C, 8]
    lms = jnp.zeros((8, c, npad), jnp.int32)
    lms = lms.at[:, :, :n].set(jnp.transpose(state, (2, 1, 0)))

    out = decode_cbr_fused_single(
        feed,
        sfvalT.reshape(wp, c, gt, 128),
        lms.reshape(8, c, gt, 128),
        rs=rs, sff=sff, c=c, m=m, interpret=interpret,
    )  # [Wp*sff, C, GT, 128]

    out = out.reshape(wp * sff, c, npad)[:frames]
    if lane_output:
        return out.reshape(frames, c * npad)
    return out[:, :, :n].transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# VBR: single-kernel extract + dequant + recurrence
# ---------------------------------------------------------------------------


def _plan_vbr_blocks_3d(wg: int, gc: int, nw: int):
    """(mw window-groups per block, padded WG) for the 3D single kernel:
    out/dq blocks are mw*gc x G_SUB x 128 i16, words blocks mw*nw x G_SUB x
    128 i32 -- all bounded for VMEM at the 2048-chunk lane block."""
    import math

    mw = 8 // math.gcd(gc, 8)
    # growth bounds sized against the 16 MB scoped-VMEM kernel stack: the
    # extraction phase keeps ~10 [mw*gc, G_SUB, 128] i32 temps live, so
    # out_rows is capped at 256 (mw*gc=320 measured 16.88M > 16M on v5e)
    while (
        2 * mw * gc <= 256
        and 2 * mw * nw * G_SUB * 128 * 4 <= (1 << 21)
        and 2 * mw * gc * G_SUB * 128 * 2 <= (1 << 21)
    ):
        mw *= 2
    wgp = -(-wg // mw) * mw
    return mw, wgp


def _make_vbr_fused_kernel(nw: int, g: int, c: int, mw: int):
    gc = g * c
    out_rows = mw * gc
    frames_blk = mw * g
    consts = {r: tables.rs_curve_constants(r) for r in range(1, 9)}

    def chain(wid, idx, dtype):
        acc = jnp.full(wid.shape, consts[1][idx], dtype)
        for r in range(2, 9):
            acc = jnp.where(wid == r, dtype(consts[r][idx]), acc)
        return acc

    def kernel(
        lms_ref, words_ref, phase_ref, wsum_ref, wid_ref, pre_ref, sfv_ref,
        out_ref, dq_scratch, h_scratch, w_scratch,
    ):
        rb = pl.program_id(1)

        @pl.when(rb == 0)
        def _():
            h_scratch[:] = lms_ref[0:4]
            w_scratch[:] = lms_ref[4:8]

        shr = jax.lax.shift_right_logical
        words = words_ref[...]  # [mw, nw, G, 128] int32 big-endian words
        expand_c = lambda a: jnp.broadcast_to(
            a[:, None, :, :, :], (mw, g, c, G_SUB, 128)
        ).reshape(out_rows, G_SUB, 128)
        expand_g = lambda a: jnp.broadcast_to(
            a[:, None, :, :], (mw, gc, G_SUB, 128)
        ).reshape(out_rows, G_SUB, 128)
        wid_r = expand_c(wid_ref[...])
        pre_r = expand_c(pre_ref[...])
        sfv_r = expand_c(sfv_ref[...])
        phase_r = expand_g(phase_ref[...])
        wsum_r = expand_g(wsum_ref[...])
        t_r = jax.lax.broadcasted_iota(
            jnp.int32, (mw, g, c, G_SUB, 128), 1
        ).reshape(out_rows, G_SUB, 128)

        local = phase_r + t_r * wsum_r + pre_r
        idx = jnp.minimum(local >> jnp.int32(5), jnp.int32(nw - 2))
        s = jnp.minimum(local - (idx << jnp.int32(5)), jnp.int32(31))

        wj = jnp.zeros((out_rows, G_SUB, 128), jnp.int32)
        wj1 = jnp.zeros((out_rows, G_SUB, 128), jnp.int32)
        for j in range(nw - 1):
            m = idx == jnp.int32(j)
            wa = jnp.broadcast_to(
                words[:, j][:, None, :, :], (mw, gc, G_SUB, 128)
            ).reshape(out_rows, G_SUB, 128)
            wb = jnp.broadcast_to(
                words[:, j + 1][:, None, :, :], (mw, gc, G_SUB, 128)
            ).reshape(out_rows, G_SUB, 128)
            wj = jnp.where(m, wa, wj)
            wj1 = jnp.where(m, wb, wj1)

        u = (wj << s) | shr(shr(wj1, jnp.int32(1)), jnp.int32(31) - s)
        code = shr(u, jnp.int32(32) - wid_r) & ((jnp.int32(1) << wid_r) - 1)

        c0 = chain(wid_r, 0, jnp.float32)
        stepf = chain(wid_r, 1, jnp.float32)
        endv = chain(wid_r, 2, jnp.float32)
        kmax = chain(wid_r, 3, jnp.int32)
        k = code >> jnp.int32(1)
        curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepf
        curve = jnp.where(k == kmax, endv, curve)
        curve = jnp.where(k == jnp.int32(0), c0, curve)
        dq = jnp.floor(sfv_r * curve + jnp.float32(0.5)).astype(jnp.int32)
        dq = jnp.where((code & jnp.int32(1)) == jnp.int32(1), -dq, dq)
        dq_scratch[...] = dq.astype(jnp.int16)

        i16_min = jnp.int32(-32768)
        i16_max = jnp.int32(32767)

        def body(f, carry):
            h0, h1, h2, h3, w0, w1, w2, w3 = carry
            dq_f = dq_scratch[pl.ds(f * c, c)].astype(jnp.int32)
            pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> jnp.int32(13)
            recon = jnp.minimum(jnp.maximum(pred + dq_f, i16_min), i16_max)
            out_ref[f] = recon.astype(jnp.int16)
            delta = dq_f >> jnp.int32(4)
            w0 = w0 + jnp.where(h0 < 0, -delta, delta)
            w1 = w1 + jnp.where(h1 < 0, -delta, delta)
            w2 = w2 + jnp.where(h2 < 0, -delta, delta)
            w3 = w3 + jnp.where(h3 < 0, -delta, delta)
            return (h1, h2, h3, recon, w0, w1, w2, w3)

        carry0 = (
            h_scratch[0], h_scratch[1], h_scratch[2], h_scratch[3],
            w_scratch[0], w_scratch[1], w_scratch[2], w_scratch[3],
        )
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(frames_blk), body, carry0
        )
        for i in range(4):
            h_scratch[i] = carry[i]
            w_scratch[i] = carry[4 + i]

    return kernel, out_rows, frames_blk


@partial(jax.jit, static_argnames=("nw", "g", "c", "mw", "interpret"))
def decode_vbr_fused_single(
    words: jnp.ndarray,  # int32[WGp, nw, GT, 128]
    phase: jnp.ndarray,  # int32[WGp, GT, 128]
    wsum: jnp.ndarray,  # int32[WGp, GT, 128]
    wid: jnp.ndarray,  # int32[WGp, C, GT, 128]
    pre: jnp.ndarray,  # int32[WGp, C, GT, 128]
    sfv: jnp.ndarray,  # f32[WGp, C, GT, 128]
    lms3: jnp.ndarray,  # int32[8, C, GT, 128]
    nw: int,
    g: int,
    c: int,
    mw: int,
    interpret: bool = False,
) -> jnp.ndarray:  # int16[WGp*g, C, GT, 128]
    wgp, _, gt, _ = words.shape
    kernel, out_rows, frames_blk = _make_vbr_fused_kernel(nw, g, c, mw)
    assert wgp % mw == 0 and gt % G_SUB == 0
    grid = (gt // G_SUB, wgp // mw)
    z = lambda i: i * 0
    spec_g = lambda lead: pl.BlockSpec(
        (lead, G_SUB, 128), lambda gb, rb: (rb, gb, z(rb)),
        memory_space=pltpu.VMEM,
    )
    spec_c = lambda lead: pl.BlockSpec(
        (lead, c, G_SUB, 128), lambda gb, rb: (rb, z(rb), gb, z(rb)),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((wgp * g, c, gt, 128), jnp.int16),
        in_specs=[
            pl.BlockSpec(
                (8, c, G_SUB, 128), lambda gb, rb: (z(rb), z(rb), gb, z(rb)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (mw, nw, G_SUB, 128), lambda gb, rb: (rb, z(rb), gb, z(rb)),
                memory_space=pltpu.VMEM,
            ),
            spec_g(mw),
            spec_g(mw),
            spec_c(mw),
            spec_c(mw),
            spec_c(mw),
        ],
        out_specs=pl.BlockSpec(
            (frames_blk, c, G_SUB, 128), lambda gb, rb: (rb, z(rb), gb, z(rb)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((out_rows, G_SUB, 128), jnp.int16),
            pltpu.VMEM((4, c, G_SUB, 128), jnp.int32),
            pltpu.VMEM((4, c, G_SUB, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lms3, words, phase, wsum, wid, pre, sfv)


def fused_vbr_single_supported(
    frames: int, sff: int, c: int, res_len: int, max_code_bits: int = 8
) -> bool:
    """Fetch-geometry gate of the two-kernel VBR path, plus this kernel's
    scoped-VMEM footprint.

    The footprint check exists because ``_plan_vbr_blocks_3d``'s *initial*
    ``mw`` is alignment-forced (``8 // gcd(gc, 8)``): its growth loop keeps
    ``out_rows <= 256``, but at large ``g*c`` the starting point is already
    past it (channels=255 => out_rows=2040, observed 16 MB+ scoped-VMEM
    overflow on v5e: three ~8 MB ``[out_rows|8*c, G_SUB, 128]`` scratch
    operands). Interpret mode enforces no limit, so this must be gated
    statically; rejected shapes fall back to the two-kernel / XLA windowed
    path, which handles any channel count."""
    from .device_decode import _group_frames, _vbr_fetch_geometry
    from .pallas_dequant import fused_vbr_supported

    if not fused_vbr_supported(frames, sff, c, res_len, max_code_bits):
        return False
    g = _group_frames(sff, c)
    gc = g * c
    _bw, _k1, nw, _need = _vbr_fetch_geometry(res_len, gc, max_code_bits)
    mw, _wgp = _plan_vbr_blocks_3d(frames // sff * (sff // g), gc, nw)
    out_rows = mw * gc
    if out_rows > MAX_OUT_ROWS:
        return False
    # Per-grid-step VMEM estimate: c-proportional planes (lms3 block 8 +
    # hist/wts scratch 2*4, i32) + wid/pre/sfv blocks (3*mw*c, i32) + words
    # (mw*nw, i32) + phase/wsum (2*mw, i32) + out/dq (2*out_rows, i16) + a
    # 4-plane i32 allowance for the extraction temps (calibrated against
    # the CBR kernel's measured limit: 480 rows = 16.88 MB ~ 4.3 i32
    # planes/row), against a 15 MB budget (16 MB v5e minus margin).
    lane = G_SUB * 128
    est = lane * (
        16 * c * 4
        + 3 * mw * c * 4
        + mw * nw * 4
        + 2 * mw * 4
        + 2 * out_rows * 2
        + 4 * out_rows * 4
    )
    return est <= 15 * (1 << 20)


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames", "frames", "sfb", "max_code_bits",
        "interpret", "lane_output",
    ),
)
def decode_chunks_packed_fused_vbr_single(
    res_bytes: jnp.ndarray,  # uint8[N, B] packed residual section
    sf_codes: jnp.ndarray,  # uint8[N, W, C]
    rs: jnp.ndarray,  # uint8[N, W, C] per-window residual sizes
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    scale_factor_frames: int,
    frames: int,
    sfb: int,
    max_code_bits: int = 8,
    interpret: bool = False,
    lane_output: bool = False,
) -> jnp.ndarray:  # int16[N, F, C] (or lane-major [F, C*Npad])
    """Full VBR device decode with the MXU word fetch feeding ONE Pallas
    kernel (extract + dequant + recurrence, dq in VMEM scratch)."""
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
    g, n_groups, wg, gc, wsum, prefix, gstart = _vbr_group_addressing(
        rs32, frames, sff, c
    )
    _bw, k1, nw, need = _vbr_fetch_geometry(b, gc, max_code_bits)
    mw, wgp = _plan_vbr_blocks_3d(wg, gc, nw)
    lane_block = G_SUB * 128
    npad = -(-n // lane_block) * lane_block
    gt = npad // 128

    base8 = jnp.minimum(gstart >> 8, k1 - 1)  # [N, WG]
    phase = gstart - (base8 << 8)
    words_t = _fetch_neighborhood_matmul(
        jnp.pad(res_bytes, ((0, 0), (0, need - b))), base8, k1, nw,
        transposed=True,
    ).astype(jnp.int32)  # [WG, nw, N]

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

    def pad_c(a):  # [N, W, C] -> [WGp, C, Npad]
        a_wg = jnp.broadcast_to(
            a[:, :, None, :], (n, w, n_groups, c)
        ).reshape(n, wg, c)
        return pad2(jnp.transpose(a_wg, (1, 2, 0)), (wgp, c, npad))

    sfval_win, *_ = _dequant_window_constants(
        sf_codes.astype(jnp.int32), rs32, sfb, 0
    )
    wid_p = pad_c(rs32)
    pre_p = pad_c(prefix)
    sfv_p = pad_c(sfval_win)

    state = jnp.concatenate([hist0, wts0], axis=-1)  # [N, C, 8]
    lms = jnp.zeros((8, c, npad), jnp.int32)
    lms = lms.at[:, :, :n].set(jnp.transpose(state, (2, 1, 0)))

    out = decode_vbr_fused_single(
        words_p.reshape(wgp, nw, gt, 128),
        phase_p.reshape(wgp, gt, 128),
        wsum_p.reshape(wgp, gt, 128),
        wid_p.reshape(wgp, c, gt, 128),
        pre_p.reshape(wgp, c, gt, 128),
        sfv_p.reshape(wgp, c, gt, 128),
        lms.reshape(8, c, gt, 128),
        nw=nw, g=g, c=c, mw=mw, interpret=interpret,
    )  # [WGp*g, C, GT, 128]

    out = out.reshape(wgp * g, c, npad)[:frames]
    if lane_output:
        return out.reshape(frames, c * npad)
    return out[:, :, :n].transpose(2, 0, 1)
