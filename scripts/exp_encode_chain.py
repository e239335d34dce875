"""Experiment: shorten the encode search kernel's per-sample dependent chain.

The window-search kernel (ops/pallas_encode.py) is latency-bound on its
per-sample recurrence (~134 ns/step at 128 lanes x 16 candidates; see
IMPLEMENTATION_NOTES). This experiment validates two chain-shortening
rewrites BEFORE any kernel edit, so the shipped .jax_cache stays intact
until a measured win justifies repopulating it:

1. **Direct zig-zag magnitude**: the closed-form quantizer (derived from
   reference qt.rs:8-31) currently computes q via two branch expressions
   and four selects. Provable identity: with c = clamped residual,
   m = 2^rs,
       k    = |c| >> 1            with overrides  (c == m      -> m/2 - 1)
                                                  (rs2, c==-2  -> 0)
                                                  (rs2, c== 2  -> 0)
       sign = c < 0
       q    = 2k + sign
   -- 5 serial ops instead of ~8, and q (needed only for the codes output)
   moves OFF the recurrence chain.

2. **sea_div correction**: n + (sign(v) - sign(n)) == n + (n==0)*sign(v),
   because n always has the sign of v or is zero (v>0 makes every addend
   >=0 with the +0x8000 rounding term >0; v<0 bounds the rounding term at
   +128 which the >>8 floors to 0). sign(v) branches off the chain early;
   the on-chain tail becomes compare+select+add.

Checks (CPU, exhaustive where the domain is small):
  A. quantize identity over ALL (rs, c) pairs, rs 1..8, c in [-m, m].
  B. sea_div identity over ALL reciprocals used (rs 1..8 x sfb 3..5) x
     every v in [-2^19, 2^19].
  C. full-kernel equality in Pallas interpret mode: variant kernel vs
     ops.pallas_encode over randomized windows (mixed rs, ragged tails,
     multi-window carries), asserting codes/sf/ranks/state all identical.

TPU timing (run when a chip is reachable):
  SEA_EXP_TIME=1 python scripts/exp_encode_chain.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sea_codec_tpu.ops import pallas_encode as pe
from sea_codec_tpu.ops import tables

I32_SIGN = pe.I32_SIGN


# ============================ check A: quantize ============================

def quantize_ref(c: np.ndarray, rs: int) -> np.ndarray:
    """The current kernel's closed form (pallas_encode.py sample_step)."""
    m = 1 << rs
    i = c + m
    q_desc = m - 1 - ((np.maximum(i - 1, 0) >> 1) << 1)
    q_asc = ((i - m) >> 1) << 1
    q = np.where(i < m, q_desc, np.where(i == 2 * m, m - 2, q_asc))
    if m == 4:
        q = np.where(i == 2, 1, q)
        q = np.where(i == 6, 0, q)
    return q


def quantize_new(c: np.ndarray, rs: int) -> tuple[np.ndarray, np.ndarray]:
    """Direct magnitude form: k then q = 2k + (c<0)."""
    m = 1 << rs
    ac = np.abs(c)
    k = ac >> 1
    k = np.where(ac == m, m // 2 - 1, k)  # both saturated endpoints
    if m == 4:
        k = np.where(ac == 2, 0, k)
    neg = (c < 0).astype(c.dtype)
    return k, (k << 1) + neg


def check_quantize() -> None:
    for rs in range(1, 9):
        m = 1 << rs
        c = np.arange(-m, m + 1, dtype=np.int32)
        q_ref = quantize_ref(c, rs)
        k_new, q_new = quantize_new(c, rs)
        np.testing.assert_array_equal(q_new, q_ref, err_msg=f"q rs={rs}")
        np.testing.assert_array_equal(k_new, q_ref >> 1, err_msg=f"k rs={rs}")
        np.testing.assert_array_equal(
            q_new & 1, q_ref & 1, err_msg=f"sign rs={rs}"
        )
    print("A. quantize identity: OK (rs 1..8, all clamped values)")


# ============================ check B: sea_div =============================

def check_sea_div() -> None:
    recips = set()
    for sfb in (3, 4, 5):
        for rb in range(1, 9):
            recips.update(int(r) for r in tables.reciprocals(rb, sfb))
    v = np.arange(-(1 << 19), (1 << 19) + 1, dtype=np.int64)
    sign_v = np.sign(v)
    for recip in sorted(recips):
        r_hi, r_lo = recip >> 8, recip & 0xFF
        n = (v * r_hi + ((v * r_lo + 0x8000) >> 8)) >> 8
        ref = n + (sign_v - np.sign(n))
        new = n + np.where(n == 0, sign_v, 0)
        if not np.array_equal(ref, new):
            bad = np.nonzero(ref != new)[0][:5]
            raise AssertionError(f"sea_div mismatch recip={recip} v={v[bad]}")
    print(f"B. sea_div identity: OK ({len(recips)} reciprocals x 2^20+1 v)")


# ===================== check C: full kernel (interpret) ====================

def _make_kernel_variant(s, l, sff, sffp, wb, all_valid=False, cheap_rank=False):
    """pe._make_kernel with the two rewrites applied (unrolled form only).

    ``all_valid=True`` additionally drops every ``where(valid, ...)`` mask:
    legal only when the caller guarantees nv == sff for every window/lane
    (the corpus hot path -- ragged tails already batch into separate
    lane-packed calls). Removes the select after each LMS update and the
    rank-accumulate selects from the recurrence chain.

    ``cheap_rank=True`` replaces the generic u64-pair rank arithmetic with
    exact narrow-domain forms (the throughput lever -- the penalty is ~60%
    of per-step vector ops):

    - err^2: |err| <= 65535 structurally (both operands clamped i16), so
      the low-32 multiply IS the exact u32 value; the pair is (0, err*err).
    - weights penalty (lms.rs:53-62): with h_i = w_i >> 9, r_i = w_i - h_i*512
      (so 0 <= r_i < 512),
        sum(w^2) = A*2^18 + B*2^10 + C,  A = sum(h^2), B = sum(h*r), C = sum(r^2)
      and sum(w^2) >> 18 == A + (B>>8) + (((B & 255) << 10) + C) >> 18
      EXACTLY in i32, valid while |w| < 2^23 (A <= 4*2^28 < 2^31; the
      remainder term (B0<<10)+C < 2^21). p = max(s18 - 0x8ff, 0) then one
      _sq64(p) gives the exact u64 penalty. |w| < 2^23 also bounds the
      reference's own exact domain (its i64 sum / u64 p^2 wrap beyond
      ~2^24); per-step growth is <= max|dqt|>>4 = 1693, so a chunk from
      reset state stays below 2^20 with 5000x margin."""
    _shr = pe._shr
    _sea_base = None  # inline below

    def kernel(
        state_ref, samples_ref, nv_ref, sfval_ref, recip_ref, rci_ref,
        rcf_ref, codes_ref, sf_ref, ranks_ref, state_out_ref,
        h_s, w_s, p_s, q_s,
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
            if sffp > sff:
                q_s[sff:] = jnp.zeros((sffp - sff, s, l), jnp.int32)

        def window_body(wi, carry):
            h0, h1, h2, h3, w0, w1, w2, w3, prev_sf = carry
            sfval = sfval_ref[wi]
            recip = recip_ref[wi]
            rci = rci_ref[wi]
            climit = rci[0:1, :]
            kmax = rci[1:2, :]
            nv = nv_ref[wi]
            rcf = rcf_ref[wi]
            c0 = rcf[0:1, :]
            stepfloor = rcf[1:2, :]
            endval = rcf[2:3, :]

            is_rs2 = climit == jnp.int32(4)
            khalf = _shr(climit, 1) - one  # m/2 - 1, the c==m override
            # sea_div constants hoisted off the per-sample chain
            r_hi = recip >> jnp.int32(8)
            r_lo = recip & jnp.int32(0xFF)

            def sample_step(t, smp, sc):
                h0, h1, h2, h3, w0, w1, w2, w3, rank_hi, rank_lo = sc
                pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> jnp.int32(13)
                residual = smp - pred
                # sea_div with the (n==0)*sign(v) correction
                n = (residual * r_hi
                     + ((residual * r_lo + jnp.int32(0x8000)) >> jnp.int32(8))
                     ) >> jnp.int32(8)
                scaled = n + jnp.where(n == zero, jnp.sign(residual), zero)
                clamped = jnp.minimum(jnp.maximum(scaled, -climit), climit)
                # direct zig-zag magnitude (identity proven in check A)
                ac = jnp.abs(clamped)
                k = _shr(ac, 1)
                k = jnp.where(ac == climit, khalf, k)
                k = jnp.where(is_rs2 & (ac == jnp.int32(2)), zero, k)
                neg = clamped < zero
                # dequant (unchanged f32 semantics)
                curve = jnp.float32(0.5) + k.astype(jnp.float32) * stepfloor
                curve = jnp.where(k == kmax, endval, curve)
                curve = jnp.where(k == zero, c0, curve)
                dq_abs = jnp.floor(sfval * curve + jnp.float32(0.5)).astype(jnp.int32)
                dq = jnp.where(neg, -dq_abs, dq_abs)
                recon = jnp.minimum(jnp.maximum(pred + dq, i16_min), i16_max)
                err = smp - recon
                if cheap_rank:
                    e2 = err * err  # exact u32 bit pattern (|err| <= 65535)
                    nine = jnp.int32(9)
                    g0 = w0 >> nine
                    g1 = w1 >> nine
                    g2 = w2 >> nine
                    g3 = w3 >> nine
                    r0 = w0 - (g0 << nine)
                    r1 = w1 - (g1 << nine)
                    r2 = w2 - (g2 << nine)
                    r3 = w3 - (g3 << nine)
                    A = g0 * g0 + g1 * g1 + g2 * g2 + g3 * g3
                    B = g0 * r0 + g1 * r1 + g2 * r2 + g3 * r3
                    C = r0 * r0 + r1 * r1 + r2 * r2 + r3 * r3
                    s18 = (A + (B >> jnp.int32(8))
                           + ((((B & jnp.int32(255)) << jnp.int32(10)) + C)
                              >> jnp.int32(18)))
                    p = jnp.maximum(s18 - jnp.int32(0x8FF), zero)
                    p_hi, p_lo = pe._sq64(p)
                    a_lo = p_lo + e2
                    a_hi = p_hi + pe._ult(a_lo, e2).astype(jnp.int32)
                else:
                    e_hi, e_lo = pe._err_sq_pair(err)
                    p_hi, p_lo = pe._weights_penalty_pair(w0, w1, w2, w3)
                    a_hi, a_lo = pe._pair_add(e_hi, e_lo, p_hi, p_lo)
                n_hi, n_lo = pe._pair_add(rank_hi, rank_lo, a_hi, a_lo)
                # q reconstructed off the recurrence chain
                q_s[t] = (k << one) + neg.astype(jnp.int32)
                delta = dq >> jnp.int32(4)
                if all_valid:
                    rank_hi, rank_lo = n_hi, n_lo
                    w0 = w0 + jnp.where(h0 < 0, -delta, delta)
                    w1 = w1 + jnp.where(h1 < 0, -delta, delta)
                    w2 = w2 + jnp.where(h2 < 0, -delta, delta)
                    w3 = w3 + jnp.where(h3 < 0, -delta, delta)
                    return (h1, h2, h3, recon, w0, w1, w2, w3, rank_hi, rank_lo)
                valid = jnp.int32(t) < nv
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

            smp_w = samples_ref[wi]
            sc = (
                h0, h1, h2, h3, w0, w1, w2, w3,
                jnp.zeros((s, l), jnp.int32), jnp.zeros((s, l), jnp.int32),
            )
            for t in range(sff):
                sc = sample_step(t, smp_w[t : t + 1, :], sc)
            h0, h1, h2, h3, w0, w1, w2, w3, rank_hi, rank_lo = sc

            sub = jax.lax.broadcasted_iota(jnp.int32, (s, l), 0)
            rot = (sub - prev_sf) & jnp.int32(s - 1)
            xhi = rank_hi ^ I32_SIGN
            min_hi = jnp.min(xhi, axis=0, keepdims=True)
            m1 = xhi == min_hi
            xlo = jnp.where(m1, rank_lo ^ I32_SIGN, u32_max ^ I32_SIGN)
            min_lo = jnp.min(xlo, axis=0, keepdims=True)
            m2 = m1 & (xlo == min_lo)
            rot_m = jnp.where(m2, rot, jnp.int32(s))
            min_rot = jnp.min(rot_m, axis=0, keepdims=True)
            winner = m2 & (rot_m == min_rot)

            def select(x):
                return jnp.sum(
                    jnp.where(winner, x, zero), axis=0, keepdims=True,
                    dtype=jnp.int32,
                )

            best_sf = select(sub)
            sf_ref[wi] = best_sf
            ranks_ref[wi] = jnp.concatenate(
                [select(rank_hi), select(rank_lo)], axis=0
            )
            rows = [select(q_s[t]) for t in range(sff)]
            rows += [jnp.zeros((1, l), jnp.int32)] * (sffp - sff)
            codes_ref[wi] = jnp.concatenate(rows, axis=0)

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


def run_variant(state, samples, nv, streams, wb, wp, sff, sfb, c,
                interpret=False, l=0, all_valid=False, cheap_rank=False):
    """pe.run_window_search with the variant kernel."""
    s = 1 << sfb
    l = l or -(-c // 128) * 128
    sffp = -(-sff // 8) * 8
    sfval, recip, rci, rcf = streams
    wc = samples.shape[0] // sff
    smp = jnp.zeros((wp, sffp, l), jnp.int32)
    smp = smp.at[:wc, :sff, :c].set(samples.reshape(wc, sff, c))
    kernel = _make_kernel_variant(s, l, sff, sffp, wb, all_valid=all_valid,
                                  cheap_rank=cheap_rank)
    zi = lambda w: w * 0
    out_shapes = (
        jax.ShapeDtypeStruct((wp, sffp, l), jnp.int32),
        jax.ShapeDtypeStruct((wp, 1, l), jnp.int32),
        jax.ShapeDtypeStruct((wp, 2, l), jnp.int32),
        jax.ShapeDtypeStruct((9, s, l), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=(wp // wb,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((9, s, l), lambda w: (zi(w),) * 3, memory_space=pltpu.VMEM),
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
            pl.BlockSpec((9, s, l), lambda w: (zi(w),) * 3, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, s, l), jnp.int32),
            pltpu.VMEM((4, s, l), jnp.int32),
            pltpu.VMEM((1, s, l), jnp.int32),
            pltpu.VMEM((sffp, s, l), jnp.int32),
        ],
        interpret=interpret,
    )(state, smp, nv, sfval, recip, rci, rcf)


def check_kernel(interpret=True, seed=0, cases=None) -> None:
    from sea_codec_tpu.ops import lms as lms_ops

    rng = np.random.default_rng(seed)
    cases = cases or [
        # (c, sff, sfb, n_windows, rs mode, ragged, all_valid, cheap_rank)
        # -- small: interpret-mode tracing cost scales with windows x steps
        # x ops. all_valid cases need nw % wb == 0 (no padded windows) and
        # no ragged tail -- the integration constraint of that variant.
        (2, 10, 4, 4, "const3", False, False, False),
        (2, 5, 4, 4, "mixed", True, False, False),
        (3, 5, 3, 4, "mixed", True, False, False),
        (1, 10, 5, 2, "mixed", False, False, False),
        (8, 5, 4, 4, "const8", True, False, False),
        (2, 10, 4, 8, "const3", False, True, False),
        (3, 5, 4, 8, "mixed", False, True, False),
        # cheap_rank: normal content, ragged, all_valid, and the
        # domain-edge big-weights stress (penalty heavily nonzero)
        (2, 10, 4, 4, "const3", False, False, True),
        (2, 5, 4, 4, "mixed", True, False, True),
        (3, 5, 4, 8, "mixed", False, True, True),
        (2, 10, 4, 4, "bigw", False, False, True),
        (8, 5, 4, 4, "bigw", True, False, True),
    ]
    for c, sff, sfb, nw, mode, ragged, all_valid, cheap_rank in cases:
        print(f"C. case c={c} sff={sff} sfb={sfb} {mode} ragged={ragged}"
              f" all_valid={all_valid} cheap_rank={cheap_rank}...", flush=True)
        if mode == "const3":
            rs = np.full((nw, c), 3, np.int32)
        elif mode == "const8":
            rs = np.full((nw, c), 8, np.int32)
        else:
            rs = rng.integers(1, 9, size=(nw, c)).astype(np.int32)
        samples = rng.integers(-32768, 32768, size=(nw * sff, c)).astype(np.int32)
        n_valid = np.full(nw, sff, np.int32)
        if ragged:
            n_valid[-1] = sff - 2
        hist0 = np.tile(lms_ops.initial_history(1), (c, 1)).astype(np.int32)
        if mode == "bigw":
            # weights near the cheap_rank exactness domain edge (|w| < 2^23):
            # entry |w| up to ~2^22, growth over the whole case is
            # nw*sff*1693 << 2^22, so every step stays in-domain while the
            # penalty is wildly nonzero (p ~ 2^15) -- stresses s18 and
            # _sq64(p) against the generic u64-pair path.
            wts0 = rng.integers(-(1 << 22), 1 << 22, size=(c, 4)).astype(np.int32)
        else:
            wts0 = np.tile(lms_ops.initial_weights(1), (c, 1)).astype(np.int32)
        prev0 = np.zeros(c, np.int32)

        ref = pe.encode_windows_pallas_fn(
            jnp.asarray(samples), jnp.asarray(rs), jnp.asarray(n_valid),
            jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0),
            scale_factor_frames=sff, scale_factor_bits=sfb,
            interpret=interpret,
        )

        streams, wb, wp = pe.prepare_window_streams(jnp.asarray(rs), sff, sfb, c)
        nv = pe.prepare_n_valid(jnp.asarray(n_valid), wp, c)
        state = pe.pack_state(
            jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0),
            1 << sfb, c,
        )
        if all_valid:
            assert wp == nw and not ragged, "all_valid case has padded windows"
        raw = run_variant(state, jnp.asarray(samples), nv, streams, wb, wp,
                          sff, sfb, c, interpret=interpret, all_valid=all_valid,
                          cheap_rank=cheap_rank)
        new = pe.unpack_outputs(*raw, nw, sff, c)

        names = ("sf", "codes", "ranks", "hist", "wts", "prev_sf")
        for nm, a, b in zip(names, ref, new):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{nm} differs (c={c} sff={sff} sfb={sfb} {mode} "
                        f"all_valid={all_valid} cheap_rank={cheap_rank})",
            )
        print(f"C. kernel equality: OK c={c} sff={sff} sfb={sfb} {mode} "
              f"ragged={ragged} all_valid={all_valid} cheap_rank={cheap_rank}")


# ============================== TPU timing =================================

def time_tpu() -> None:
    """Old vs variant kernel wall time on the device_encode bench shape."""
    from sea_codec_tpu.ops import lms as lms_ops

    c, sff, sfb = 128, 20, 4  # 128 lanes, the corpus block geometry
    nw = 256 * 16  # windows: 16 chunks x 256 windows
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=(nw * sff, c)).astype(np.int32)
    rs = np.full((nw, c), 3, np.int32)
    n_valid = np.full(nw, sff, np.int32)
    hist0 = np.tile(lms_ops.initial_history(1), (c, 1)).astype(np.int32)
    wts0 = np.tile(lms_ops.initial_weights(1), (c, 1)).astype(np.int32)
    prev0 = np.zeros(c, np.int32)

    streams, wb, wp = pe.prepare_window_streams(jnp.asarray(rs), sff, sfb, c)
    nv = pe.prepare_n_valid(jnp.asarray(n_valid), wp, c)
    state = pe.pack_state(
        jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0), 1 << sfb, c
    )
    smp = jnp.asarray(samples)

    old = jax.jit(lambda st, sm: pe.run_window_search(
        st, sm, nv, streams, wb, wp, sff, sfb, c)[0])
    newf = jax.jit(lambda st, sm: run_variant(
        st, sm, nv, streams, wb, wp, sff, sfb, c)[0])
    newav = jax.jit(lambda st, sm: run_variant(
        st, sm, nv, streams, wb, wp, sff, sfb, c, all_valid=True)[0])
    newcr = jax.jit(lambda st, sm: run_variant(
        st, sm, nv, streams, wb, wp, sff, sfb, c, cheap_rank=True)[0])
    newall = jax.jit(lambda st, sm: run_variant(
        st, sm, nv, streams, wb, wp, sff, sfb, c, all_valid=True,
        cheap_rank=True)[0])

    n_samples = nw * sff * c
    for name, fn in (("old", old), ("new", newf), ("new+allvalid", newav),
                     ("new+cheaprank", newcr), ("new+av+cheaprank", newall)):
        out = fn(state, smp)
        jax.block_until_ready(out)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(state, smp))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name}: {t * 1e3:.2f} ms = {n_samples / t / 1e6:.0f} Msps-lane "
              f"({t / (nw * sff) * 1e9:.0f} ns/step)")


if __name__ == "__main__":
    check_quantize()
    check_sea_div()
    check_kernel(interpret=os.environ.get("SEA_EXP_COMPILED") != "1")
    if os.environ.get("SEA_EXP_TIME") == "1":
        time_tpu()
