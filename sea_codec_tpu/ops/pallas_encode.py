"""Pallas TPU kernel for the encoder's scale-factor search.

The encoder hot loop (reference ``encoder_base.rs:43-144``) evaluates all
2^sfb candidate scale factors over each window of ``scale_factor_frames``
samples, each candidate running the predict/quantize/reconstruct/LMS-update
recurrence and accumulating a 64-bit rank. The XLA formulation pays crushing
per-step overhead (tiny [S, C] tensors, emulated uint64, per-step gathers).
This kernel redesigns the compute for the VPU:

- **Layout**: candidates on the sublane axis (S = 2^sfb rows), file-channel
  lanes on the 128-lane axis. All state lives in [S, L] int32 registers.
- **Fixed candidate order**: lane s *is* scale factor s. The reference's
  rotated search order (``encoder_base.rs:116-117``) only matters for
  tie-breaking, reproduced exactly by a lexicographic argmin over
  (rank_hi, rank_lo, (s - prev_sf) mod S).
- **No gathers**: the zig-zag quantization table has a closed form (derived
  from ``qt.rs:8-31``, incl. the rs=2 special cases); dequantization is
  recomputed in f32 exactly as the table generation does
  (``dqt.rs:75-126``: curve(k) = 0.5+k*floor(step) with endpoint overrides,
  round-half-away via floor(x+0.5)); per-(rs, sf) constants (scale factor
  value, fixed-point reciprocal) are precomputed host-side and streamed per
  window.
- **Exact 64-bit ranks without int64**: Mosaic has no i64, so the rank is
  accumulated as a (hi, lo) int32 pair with explicit carries; unsigned
  compare/shift via sign-bit tricks. The per-step increments use exact
  narrow-domain forms (err^2 as one u32 multiply since |err| <= 65535;
  the weight penalty's sum(w^2)>>18 via an i32 split-square decomposition
  exact for |w| < 2^23, the reference's own i64/u64 non-wrap domain) --
  ~25% fewer vector ops than the generic pair forms, validated bit-equal
  on TPU incl. domain-edge weights (scripts/exp_encode_chain.py, which
  keeps the generic-form kernel alive as the cross-check variant).
  Bit-identical to the reference's u64 arithmetic,
  including wrap-around.
- The fixed-point division ``sea_div`` uses the same pure-int32
  decomposition as ops.device_encode.sea_div.

Grid: one sequential step per window; LMS/prev_sf state persists in VMEM
scratch across windows (the only cross-window state,
``encoder_base.rs:180-185``).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables

I32_SIGN = np.int32(-2147483648)  # 0x80000000


def _shr(x, n):
    """Logical (unsigned) right shift on int32 bit patterns."""
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _ult(a, b):
    """Unsigned a < b on int32 bit patterns."""
    return (a ^ I32_SIGN) < (b ^ I32_SIGN)


def _pair_add(h1, l1, h2, l2):
    lo = l1 + l2
    carry = _ult(lo, l1).astype(jnp.int32)
    return h1 + h2 + carry, lo


def _sq64(w):
    """(hi, lo) int32-pair of w*w for arbitrary int32 w (exact u64)."""
    aw = jnp.abs(w)  # -2^31 wraps to itself; bit pattern is the magnitude
    w1 = _shr(aw, 16)
    w0 = aw & jnp.int32(0xFFFF)
    mm2 = (w1 * w0) << jnp.int32(1)
    t0 = w0 * w0
    t1 = (mm2 & jnp.int32(0xFFFF)) << jnp.int32(16)
    lo = t0 + t1
    c = _ult(lo, t0).astype(jnp.int32)
    hi = w1 * w1 + _shr(mm2, 16) + c
    return hi, lo


def _weights_penalty_pair(w0, w1, w2, w3):
    """Exact u64 penalty (reference lms.rs:53-62) as an int32 pair."""
    s_hi, s_lo = _sq64(w0)
    for w in (w1, w2, w3):
        h, l = _sq64(w)
        s_hi, s_lo = _pair_add(s_hi, s_lo, h, l)
    # s >>= 18 (u64 logical shift as a pair)
    sh_hi = _shr(s_hi, 18)
    sh_lo = (s_hi << jnp.int32(14)) | _shr(s_lo, 18)
    # t = max(s - 0x8ff, 0)
    kconst = jnp.int32(0x8FF)
    borrow = _ult(sh_lo, kconst)
    t_lo = sh_lo - kconst
    t_hi = sh_hi - borrow.astype(jnp.int32)
    neg = (sh_hi == 0) & borrow
    zero = jnp.int32(0)
    t_lo = jnp.where(neg, zero, t_lo)
    t_hi = jnp.where(neg, zero, t_hi)
    # p = t^2 mod 2^64
    a = _shr(t_lo, 16)
    b = t_lo & jnp.int32(0xFFFF)
    ab = a * b
    p0 = b * b
    p1 = ab << jnp.int32(17)
    lo = p0 + p1
    c = _ult(lo, p0).astype(jnp.int32)
    hi = a * a + _shr(ab, 15) + c + ((t_hi * t_lo) << jnp.int32(1))
    return hi, lo


def _err_sq_pair(err):
    """(hi, lo) of err^2 for |err| < 2^18 (always true: |residual| < 2^19)."""
    ae = jnp.abs(err)
    e1 = _shr(ae, 16)  # <= 3
    e0 = ae & jnp.int32(0xFFFF)
    mm2 = (e1 * e0) << jnp.int32(1)
    t0 = e0 * e0
    t1 = (mm2 & jnp.int32(0xFFFF)) << jnp.int32(16)
    lo = t0 + t1
    c = _ult(lo, t0).astype(jnp.int32)
    hi = e1 * e1 + _shr(mm2, 16) + c
    return hi, lo


def _sea_div(v, recip):
    """Pure-int32 sea_div (see ops.device_encode.sea_div)."""
    r_hi = recip >> jnp.int32(8)
    r_lo = recip & jnp.int32(0xFF)
    n = (v * r_hi + ((v * r_lo + jnp.int32(0x8000)) >> jnp.int32(8))) >> jnp.int32(8)
    return n + (jnp.sign(v) - jnp.sign(n))


def _make_kernel(s: int, l: int, sff: int, sffp: int, wb: int, unroll: bool = True,
                 all_valid: bool = False, ranks_only: bool = False):
    """Build the window-search kernel: S candidates x L lanes, ``wb`` windows
    per grid step (a fori_loop inside the kernel -- per-window grid steps
    would pay block-switch overhead ~50x the window's compute).

    The per-sample recurrence is unrolled by default. ``unroll=False``
    (env ``SEA_ENCODE_ROLLED=1``) wraps it in a ``fori_loop`` instead --
    ~20x fewer Mosaic statements -- but did not reduce compile time in this
    environment (compilation runs on a shared remote service whose load
    varies 4x; see IMPLEMENTATION_NOTES.md), so the proven unrolled form
    stays the default.

    ``all_valid=True`` drops every ``where(valid, ...)`` mask from the
    recurrence (the nv stream is still an input, just unread, so call
    shapes stay identical). Legal ONLY when every real window of every
    real lane is full (nv == sff) and there are no padded windows
    (wp == wc): a padded or ragged window would then update LMS state with
    padding samples and corrupt the carry. Padding *lanes* (c..l) are fine:
    they evolve deterministic garbage that no caller reads (outputs and
    state are always sliced to the real lanes). Bit-equal to the masked
    kernel on full windows (scripts/exp_encode_chain.py case matrix);
    measured +5% on the corpus block geometry (348 -> 364 Msps-lane).

    ``ranks_only=True`` elides the candidate-code scratch stores and the
    per-window winner-code selection (``codes_ref`` is never written): the
    VBR analyze pass (reference ``encoder_vbr.rs:139-171``) consumes only
    the error ranks and the carried LMS/prev_sf state, so its kernel can
    skip ~sff stores + sff select-reduces per window. Rank and state math
    are untouched -- pass-2 inputs are bit-identical by construction."""

    def kernel(
        state_ref,  # i32[9, S, L]: h0..3, w0..3, prev_sf (broadcast over S)
        samples_ref,  # i32[WB, SFFP, L]
        nv_ref,  # i32[WB, 1, L]: per-window per-lane valid frame count
        sfval_ref,  # f32[WB, S, L] scale-factor values
        recip_ref,  # i32[WB, S, L] reciprocals
        rci_ref,  # i32[WB, 2, L]: climit (=2^rs), kmax (=2^(rs-1)-1)
        rcf_ref,  # f32[WB, 4, L]: c0, stepfloor, endval, (pad)
        codes_ref,  # out i32[WB, SFFP, L]
        sf_ref,  # out i32[WB, 1, L]
        ranks_ref,  # out i32[WB, 2, L] (hi, lo)
        state_out_ref,  # out i32[9, S, L]
        h_s,  # scratch i32[4, S, L]
        w_s,  # scratch i32[4, S, L]
        p_s,  # scratch i32[1, S, L] prev_sf
        q_s,  # scratch i32[SFFP, S, L] candidate codes
    ):
        i16_min = jnp.int32(-32768)
        i16_max = jnp.int32(32767)
        zero = jnp.int32(0)
        one = jnp.int32(1)
        u32_max = jnp.int32(-1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            h_s[:] = state_ref[0:4]
            w_s[:] = state_ref[4:8]
            p_s[:] = state_ref[8:9]
            if sffp > sff and not ranks_only:
                # padding code rows are read by the rolled path's vectorized
                # selection; zero them once (never written afterwards)
                q_s[sff:] = jnp.zeros((sffp - sff, s, l), jnp.int32)

        def window_body(wi, carry):
            h0, h1, h2, h3, w0, w1, w2, w3, prev_sf = carry
            sfval = sfval_ref[wi]  # [S, L] f32
            recip = recip_ref[wi]  # [S, L] i32
            rci = rci_ref[wi]  # [2, L]
            climit = rci[0:1, :]  # [1, L]
            kmax = rci[1:2, :]
            nv = None if all_valid else nv_ref[wi]  # [1, L]
            rcf = rcf_ref[wi]
            c0 = rcf[0:1, :]  # [1, L] f32
            stepfloor = rcf[1:2, :]
            endval = rcf[2:3, :]

            is_rs2 = climit == jnp.int32(4)
            khalf = _shr(climit, 1) - one  # m/2 - 1: the |c| == m override
            # sea_div reciprocal split hoisted off the per-sample chain
            r_hi = recip >> jnp.int32(8)
            r_lo = recip & jnp.int32(0xFF)

            def sample_step(t, smp, sc):
                h0, h1, h2, h3, w0, w1, w2, w3, rank_hi, rank_lo = sc
                pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> jnp.int32(13)
                residual = smp - pred
                # sea_div with the n + (n==0)*sign(v) tail: n always has v's
                # sign or is 0 (proven exhaustively over all reciprocals x
                # |v| <= 2^20, scripts/exp_encode_chain.py check B)
                n = (residual * r_hi
                     + ((residual * r_lo + jnp.int32(0x8000)) >> jnp.int32(8))
                     ) >> jnp.int32(8)
                scaled = n + jnp.where(n == zero, jnp.sign(residual), zero)
                clamped = jnp.minimum(jnp.maximum(scaled, -climit), climit)
                # direct zig-zag magnitude (identity vs the qt.rs:8-31 table
                # proven over every clamped value, exp_encode_chain check A):
                # k = |c|>>1 with saturated-endpoint overrides, q = 2k+(c<0)
                ac = jnp.abs(clamped)
                k = _shr(ac, 1)
                k = jnp.where(ac == climit, khalf, k)
                k = jnp.where(is_rs2 & (ac == jnp.int32(2)), zero, k)
                neg = clamped < zero
                # dequantization in f32, exactly as the table build (dqt.rs:99-126)
                curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepfloor
                curve = jnp.where(k == kmax, endval, curve)
                curve = jnp.where(k == zero, c0, curve)
                dq_abs = jnp.floor(sfval * curve + jnp.float32(0.5)).astype(jnp.int32)
                dq = jnp.where(neg, -dq_abs, dq_abs)
                recon = jnp.minimum(jnp.maximum(pred + dq, i16_min), i16_max)
                err = smp - recon
                # rank increment, exact narrow-domain forms (the generic
                # u64-pair forms below are ~60% of per-step vector ops;
                # validated bit-equal on TPU, scripts/exp_encode_chain.py):
                # - err^2: |err| <= 65535 structurally (i16 - clamped i16),
                #   so the low-32 multiply IS the exact u32 value
                # - weights penalty (lms.rs:53-62): with g = w >> 9,
                #   r = w - g*512, sum(w^2) = A*2^18 + B*2^10 + C and
                #   sum(w^2)>>18 == A + (B>>8) + (((B&255)<<10) + C) >> 18
                #   exactly in i32 while |w| < 2^23 -- also the reference's
                #   own exact domain (its i64 sum / u64 p^2 wrap beyond
                #   ~2^24). Weight growth is <= max|dqt|>>4 = 1693 per step,
                #   so |w| < 2^23 holds with >100x margin for any chunk and
                #   is preserved across chunks by the penalty-ranked search
                #   itself (a candidate near the bound ranks astronomically).
                e2 = err * err
                nine = jnp.int32(9)
                g0 = w0 >> nine
                g1 = w1 >> nine
                g2 = w2 >> nine
                g3 = w3 >> nine
                r0 = w0 - (g0 << nine)
                r1 = w1 - (g1 << nine)
                r2 = w2 - (g2 << nine)
                r3 = w3 - (g3 << nine)
                pa = g0 * g0 + g1 * g1 + g2 * g2 + g3 * g3
                pb = g0 * r0 + g1 * r1 + g2 * r2 + g3 * r3
                pc = r0 * r0 + r1 * r1 + r2 * r2 + r3 * r3
                s18 = (pa + (pb >> jnp.int32(8))
                       + ((((pb & jnp.int32(255)) << jnp.int32(10)) + pc)
                          >> jnp.int32(18)))
                p = jnp.maximum(s18 - jnp.int32(0x8FF), zero)
                p_hi, p_lo = _sq64(p)
                a_lo = p_lo + e2
                a_hi = p_hi + _ult(a_lo, e2).astype(jnp.int32)
                n_hi, n_lo = _pair_add(rank_hi, rank_lo, a_hi, a_lo)
                if not ranks_only:
                    q_s[t] = (k << one) + neg.astype(jnp.int32)
                # LMS update (lms.rs:43-51), frozen on invalid steps
                delta = dq >> jnp.int32(4)
                if all_valid:
                    w0 = w0 + jnp.where(h0 < 0, -delta, delta)
                    w1 = w1 + jnp.where(h1 < 0, -delta, delta)
                    w2 = w2 + jnp.where(h2 < 0, -delta, delta)
                    w3 = w3 + jnp.where(h3 < 0, -delta, delta)
                    return (h1, h2, h3, recon, w0, w1, w2, w3, n_hi, n_lo)
                valid = jnp.int32(t) < nv  # [1, L] mask (broadcasts over S)
                rank_hi = jnp.where(valid, n_hi, rank_hi)
                rank_lo = jnp.where(valid, n_lo, rank_lo)
                w0 = jnp.where(valid, w0 + jnp.where(h0 < 0, -delta, delta), w0)
                w1 = jnp.where(valid, w1 + jnp.where(h1 < 0, -delta, delta), w1)
                w2 = jnp.where(valid, w2 + jnp.where(h2 < 0, -delta, delta), w2)
                w3 = jnp.where(valid, w3 + jnp.where(h3 < 0, -delta, delta), w3)
                h0 = jnp.where(valid, h1, h0)
                h1 = jnp.where(valid, h2, h1)
                h2 = jnp.where(valid, h3, h2)
                h3 = jnp.where(valid, recon, h3)
                return (h0, h1, h2, h3, w0, w1, w2, w3, rank_hi, rank_lo)

            smp_w = samples_ref[wi]  # [SFFP, L]
            sc0 = (
                h0, h1, h2, h3, w0, w1, w2, w3,
                jnp.zeros((s, l), jnp.int32), jnp.zeros((s, l), jnp.int32),
            )
            if unroll:
                sc = sc0
                for t in range(sff):
                    sc = sample_step(t, smp_w[t : t + 1, :], sc)
            else:
                # the current sample is always row 0 of a rotating register
                # copy of the window: a static sublane rotate per step keeps
                # every index static (dynamic sublane slicing is a Mosaic
                # worst case -- it sent compile time past 500 s)
                def step(t, c):
                    smp_rot = c[-1]
                    sc = sample_step(t, smp_rot[0:1, :], c[:-1])
                    return sc + (
                        jnp.concatenate([smp_rot[1:], smp_rot[:1]], axis=0),
                    )

                sc = jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(sff), step, sc0 + (smp_w,)
                )[:-1]
            h0, h1, h2, h3, w0, w1, w2, w3, rank_hi, rank_lo = sc

            # lexicographic argmin over (rank_hi, rank_lo, rotated index);
            # first-minimum-in-rotated-order == the reference's
            # strict-improvement loop from prev_sf (encoder_base.rs:116-140).
            sub = jax.lax.broadcasted_iota(jnp.int32, (s, l), 0)
            rot = (sub - prev_sf) & jnp.int32(s - 1)
            xhi = rank_hi ^ I32_SIGN  # unsigned-order compare via sign flip
            min_hi = jnp.min(xhi, axis=0, keepdims=True)
            m1 = xhi == min_hi
            xlo = jnp.where(m1, rank_lo ^ I32_SIGN, u32_max ^ I32_SIGN)
            min_lo = jnp.min(xlo, axis=0, keepdims=True)
            m2 = m1 & (xlo == min_lo)
            rot_m = jnp.where(m2, rot, jnp.int32(s))
            min_rot = jnp.min(rot_m, axis=0, keepdims=True)
            winner = m2 & (rot_m == min_rot)  # exactly one row per column

            def select(x):
                return jnp.sum(
                    jnp.where(winner, x, zero), axis=0, keepdims=True, dtype=jnp.int32
                )

            best_sf = select(sub)  # [1, L]
            sf_ref[wi] = best_sf
            ranks_ref[wi] = jnp.concatenate([select(rank_hi), select(rank_lo)], axis=0)
            if ranks_only:
                pass  # codes_ref never written (caller must not read it)
            elif unroll:
                rows = [select(q_s[t]) for t in range(sff)]
                rows += [jnp.zeros((1, l), jnp.int32)] * (sffp - sff)
                codes_ref[wi] = jnp.concatenate(rows, axis=0)
            else:
                codes_ref[wi] = jnp.sum(
                    jnp.where(winner[None], q_s[:], zero),
                    axis=1,
                    dtype=jnp.int32,
                )

            # winning candidate's state broadcasts to all candidates for the
            # next window (encoder_base.rs:112,119: every candidate restarts
            # from the winner's LMS)
            bc = lambda x: jnp.broadcast_to(x, (s, l))
            return (
                bc(select(h0)), bc(select(h1)), bc(select(h2)), bc(select(h3)),
                bc(select(w0)), bc(select(w1)), bc(select(w2)), bc(select(w3)),
                bc(best_sf),
            )

        carry0 = (
            h_s[0], h_s[1], h_s[2], h_s[3],
            w_s[0], w_s[1], w_s[2], w_s[3],
            p_s[0],
        )
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(wb), window_body, carry0)
        for i in range(4):
            h_s[i] = carry[i]
            w_s[i] = carry[4 + i]
        p_s[0] = carry[8]

        state_out_ref[0:4] = h_s[:]
        state_out_ref[4:8] = w_s[:]
        state_out_ref[8:9] = p_s[:]

    return kernel


@lru_cache(maxsize=None)
def _rs_constants(scale_factor_bits: int):
    """Host-precomputed per-(rs, sf) constants, f32-exact."""
    s = 1 << scale_factor_bits
    sfval = np.zeros((9, s), dtype=np.float32)  # index by rs (1..8)
    recip = np.zeros((9, s), dtype=np.int32)
    c0 = np.zeros(9, dtype=np.float32)
    stepfloor = np.zeros(9, dtype=np.float32)
    endval = np.zeros(9, dtype=np.float32)
    kmax = np.zeros(9, dtype=np.int32)
    climit = np.zeros(9, dtype=np.int32)
    for rb in range(1, 9):
        sfval[rb] = tables.scale_factors(rb, scale_factor_bits).astype(np.float32)
        recip[rb] = tables.reciprocals(rb, scale_factor_bits)
        c0[rb], stepfloor[rb], endval[rb], kmax[rb] = tables.rs_curve_constants(rb)
        climit[rb] = 1 << rb
    return sfval, recip, c0, stepfloor, endval, kmax, climit


def prepare_window_streams(
    rs: jnp.ndarray,  # int32[W, C]
    scale_factor_frames: int,
    scale_factor_bits: int,
    c: int,
):
    """Per-window per-lane constant streams for the search kernel.

    Hoistable: for CBR these are identical for every chunk of a file, so the
    whole-file encoder computes them once outside its chunk scan.
    """
    sff = scale_factor_frames
    l = -(-c // 128) * 128  # lane width: next multiple of 128 covering c
    wc = rs.shape[0]
    sfval_t, recip_t, c0_t, stepfloor_t, endval_t, kmax_t, climit_t = _rs_constants(
        scale_factor_bits
    )
    rs_l = jnp.zeros((wc, l), jnp.int32).at[:, :c].set(rs)
    rs_l = jnp.maximum(rs_l, 1)  # padding lanes: any valid rs
    sfval = jnp.moveaxis(jnp.asarray(sfval_t)[rs_l], -1, 1)  # [W, S, L]
    recip = jnp.moveaxis(jnp.asarray(recip_t)[rs_l], -1, 1)
    rci = jnp.stack(
        [jnp.asarray(climit_t)[rs_l], jnp.asarray(kmax_t)[rs_l]], axis=1
    )  # [W, 2, L]
    rcf = jnp.stack(
        [
            jnp.asarray(c0_t)[rs_l],
            jnp.asarray(stepfloor_t)[rs_l],
            jnp.asarray(endval_t)[rs_l],
            jnp.zeros((wc, l), jnp.float32),
        ],
        axis=1,
    )  # [W, 4, L]

    # pad the window count to a multiple of the window block; padding windows
    # have n_valid == 0 and leave all state untouched
    wb = min(32, -(-wc // 8) * 8)
    wp = -(-wc // wb) * wb
    if wp != wc:
        pad = wp - wc
        sfval = jnp.pad(sfval, ((0, pad), (0, 0), (0, 0)))
        recip = jnp.pad(recip, ((0, pad), (0, 0), (0, 0)), constant_values=1)
        rci = jnp.pad(rci, ((0, pad), (0, 0), (0, 0)), constant_values=0)
        rci = rci.at[wc:, 0, :].set(2)  # climit: any valid value
        rcf = jnp.pad(rcf, ((0, pad), (0, 0), (0, 0)))
    return (sfval, recip, rci, rcf), wb, wp


def prepare_n_valid(
    n_valid: jnp.ndarray,  # int32[W] or int32[W, C] per-lane window lengths
    wp: int,
    c: int,
):
    """[WP, 1, L] per-window per-lane valid frame counts (padding: 0)."""
    l = -(-c // 128) * 128
    nv = n_valid.astype(jnp.int32)
    wc = nv.shape[0]
    if nv.ndim == 1:
        nv_l = jnp.broadcast_to(nv.reshape(wc, 1), (wc, l))
    else:
        nv_l = jnp.zeros((wc, l), jnp.int32).at[:, :c].set(nv)
    out = jnp.zeros((wp, 1, l), jnp.int32)
    return out.at[:wc, 0, :].set(nv_l)


def pack_state(hist0, wts0, prev_sf0, s: int, c: int, l: int = 0):
    l = l or -(-c // 128) * 128
    state = jnp.zeros((9, s, l), jnp.int32)
    state = state.at[0:4, :, :c].set(jnp.broadcast_to(hist0.T[:, None, :], (4, s, c)))
    state = state.at[4:8, :, :c].set(jnp.broadcast_to(wts0.T[:, None, :], (4, s, c)))
    state = state.at[8, :, :c].set(jnp.broadcast_to(prev_sf0[None, :], (s, c)))
    return state


def run_window_search(
    state: jnp.ndarray,  # int32[9, S, L] (pack_state)
    samples: jnp.ndarray,  # int32[W * sff, C]
    nv: jnp.ndarray,  # int32[WP, 1, L] (prepare_n_valid)
    streams,  # from prepare_window_streams
    wb: int,
    wp: int,
    scale_factor_frames: int,
    scale_factor_bits: int,
    c: int,
    interpret: bool = False,
    l: int = 0,  # lane width (multiple of 128; 0 = derive from c): wider
    # lanes amortize the sequential window sweep's per-step overhead over
    # more vregs -- measured 267/507/740 Msps-lane at l=128/256/512 on v5e
    # (scripts/perf_encode_lanes.py)
    all_valid: bool = False,  # drop validity masks; see _make_kernel
    ranks_only: bool = False,  # elide code stores/selection; codes output
    # is UNDEFINED (VBR analyze pass reads only ranks + state)
):
    """Raw kernel invocation; returns (codes, sf, ranks, state_out) padded."""
    sff = scale_factor_frames
    s = 1 << scale_factor_bits
    l = l or -(-c // 128) * 128
    sffp = -(-sff // 8) * 8
    sfval, recip, rci, rcf = streams
    wc = samples.shape[0] // sff
    assert not (all_valid and wp != wc), "all_valid kernel with padded windows"

    smp = jnp.zeros((wp, sffp, l), jnp.int32)
    smp = smp.at[:wc, :sff, :c].set(samples.reshape(wc, sff, c))

    import os

    kernel = _make_kernel(
        s, l, sff, sffp, wb,
        unroll=os.environ.get("SEA_ENCODE_ROLLED") != "1",
        all_valid=all_valid,
        ranks_only=ranks_only,
    )
    zi = lambda w: w * 0
    out_shapes = (
        jax.ShapeDtypeStruct((wp, sffp, l), jnp.int32),  # codes
        jax.ShapeDtypeStruct((wp, 1, l), jnp.int32),  # sf
        jax.ShapeDtypeStruct((wp, 2, l), jnp.int32),  # ranks (hi, lo)
        jax.ShapeDtypeStruct((9, s, l), jnp.int32),  # state out
    )
    codes, sf, ranks, state_out = pl.pallas_call(
        kernel,
        grid=(wp // wb,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((9, s, l), lambda w: (zi(w), zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, sffp, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, s, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, s, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 2, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 4, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wb, sffp, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 2, l), lambda w: (w, zi(w), zi(w)), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, s, l), lambda w: (zi(w), zi(w), zi(w)), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, s, l), jnp.int32),
            pltpu.VMEM((4, s, l), jnp.int32),
            pltpu.VMEM((1, s, l), jnp.int32),
            # candidate-code scratch is unused under ranks_only: shrink it
            pltpu.VMEM((1 if ranks_only else sffp, s, l), jnp.int32),
        ],
        interpret=interpret,
    )(state, smp, nv, sfval, recip, rci, rcf)
    return codes, sf, ranks, state_out


def unpack_outputs(codes, sf, ranks, state_out, wc: int, sff: int, c: int):
    sf_out = sf[:wc, 0, :c].astype(jnp.uint8)  # [W, C]
    codes_out = codes[:wc, :sff, :c].reshape(wc * sff, c).astype(jnp.uint8)
    hi = ranks[:wc, 0, :c].astype(jnp.uint32).astype(jnp.uint64)
    lo = ranks[:wc, 1, :c].astype(jnp.uint32).astype(jnp.uint64)
    ranks_out = (hi << jnp.uint64(32)) | lo  # [W, C]
    hist = state_out[0:4, 0, :c].T  # [C, 4] (all candidate rows equal)
    wts = state_out[4:8, 0, :c].T
    prev_sf = state_out[8, 0, :c].astype(jnp.int32)
    return sf_out, codes_out, ranks_out, hist, wts, prev_sf


def encode_windows_pallas_fn(
    samples: jnp.ndarray,  # int32[W * sff, C]
    rs: jnp.ndarray,  # int32[W, C]
    n_valid: jnp.ndarray,  # int32[W]
    hist0: jnp.ndarray,  # int32[C, 4]
    wts0: jnp.ndarray,  # int32[C, 4]
    prev_sf0: jnp.ndarray,  # int32[C]
    scale_factor_frames: int,
    scale_factor_bits: int,
    interpret: bool = False,
    ranks_only: bool = False,  # codes output is UNDEFINED (see run_window_search)
):
    """Drop-in replacement for ops.device_encode.encode_windows_fn (same
    returns) running the window search as a Pallas kernel."""
    s = 1 << scale_factor_bits
    wc = rs.shape[0]
    c = samples.shape[1]
    assert c <= 512, "kernel lane blocks support up to 512 lanes (VMEM bound)"
    streams, wb, wp = prepare_window_streams(
        rs, scale_factor_frames, scale_factor_bits, c
    )
    nv = prepare_n_valid(n_valid, wp, c)
    state = pack_state(hist0, wts0, prev_sf0, s, c)
    codes, sf, ranks, state_out = run_window_search(
        state, samples, nv, streams, wb, wp,
        scale_factor_frames, scale_factor_bits, c, interpret,
        ranks_only=ranks_only,
    )
    return unpack_outputs(codes, sf, ranks, state_out, wc, scale_factor_frames, c)


encode_windows_pallas = jax.jit(
    encode_windows_pallas_fn,
    static_argnames=(
        "scale_factor_frames", "scale_factor_bits", "interpret", "ranks_only",
    ),
)
