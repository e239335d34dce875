"""Experiment: exact-bound candidate pruning in the encode search kernel.

The reference's hot loop early-aborts a candidate as soon as its partial
rank exceeds the best completed candidate's rank
(``/root/reference/src/codec/encoder_base.rs:83-85``) -- on a scalar CPU
that skips most of the work, because most candidates blow past the winner
within a few samples. This script measures whether a TPU analog can pay.

The TPU kernel (ops/pallas_encode.py) evaluates all S = 2^sfb candidates in
LOCKSTEP on the sublane axis: the per-sample step costs the same whether 1
or S candidates are still viable, so pruning only helps if it reduces the
*register footprint* -- i.e. a two-phase kernel:

  phase 1: run the first k samples with all S candidates  (cost k/sff)
  bound:   candidate s is provably dead when its partial rank after k
           samples strictly exceeds some completed candidate's FULL rank
           (ranks are monotone nondecreasing: err^2 >= 0, penalty >= 0) --
           but no candidate is complete at sample k, so the usable exact
           bound is against the FINISHED phase-1 minimum only after
           finishing at least one candidate... the practical construction
           finishes the prev-window winner's candidate first (cost
           sff/S extra) or bounds against min over candidates of
           (partial_k + 0) which is NOT exact. The stats below sidestep
           the construction and measure the best case: an ORACLE bound
           (the true winner's final rank), which no realizable kernel can
           beat.
  phase 2: compact survivors onto S' < S sublanes (a per-lane bitonic
           permutation network carrying ~13 registers: h0-3, w0-3, rank
           pair, sfval, recip, original index) and run the remaining
           sff - k samples at S'/S of the vector cost.

Three measurements decide:

A. Survivor statistics (oracle bound, varied_signal corpus): the count of
   candidates per (window, lane) whose partial rank after k samples is
   <= the winner's final rank. The compaction bound S' must hold for
   EVERY lane of a vreg block at compile time, so the binding statistic
   is the per-window MAX over lanes, and the fraction of windows where
   that max is <= S'. (Measured here over 16 lanes; real blocks are
   128-512 lanes, where max-over-lanes is strictly worse.)

B. Does step cost actually scale with S? The same Pallas kernel at
   sfb=3 (S=8) vs sfb=4 (S=16), same lanes/windows: if the S=8 step is
   not ~2x faster, phase-2 savings are capped regardless of stats.

C. Cost model: phase-2 saving = (sff - k) * (1 - S'/S) * step_cost,
   vs compaction cost ~ 10 bitonic stages x 13 carried registers x
   ~3 vector ops, in units of the ~60-op sample step, PLUS the exactness
   shortfall from A (windows whose survivor max exceeds S' need a
   fallback full pass -- rerunning them doubles their cost).

Run: JAX_PLATFORMS=cpu python scripts/exp_prune.py   (stats A + model C)
     python scripts/exp_prune.py --tpu               (adds measurement B)

Decision recorded in docs/PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sea_codec_tpu.ops import lms, tables
from sea_codec_tpu.ops.device_encode import sea_div
from sea_codec_tpu.utils.signal import varied_signal

SFF = 20
SFB = 4
S = 1 << SFB
KS = (1, 2, 3, 4, 6, 8, 12)


def survivor_stats_fn(samples, rs, hist0, wts0, prev_sf0, dqt_flat, recip,
                      qtab, qt_offsets):
    """encode_windows_fn (ops/device_encode.py:57) modified to also emit,
    per window, the per-candidate rank after every sample step; survivors
    are counted post-window against the winner's final rank."""
    wc = rs.shape[0]
    c = samples.shape[1]
    n_sf = recip.shape[1]
    samples_w = samples.reshape(wc, SFF, c)

    def window_body(carry, xs):
        hist, wts, prev_sf = carry
        smp, rs_w = xs

        cand = jnp.arange(S, dtype=jnp.int32)
        sf_cand = (cand[:, None] + prev_sf[None, :]) % S
        rs_b = jnp.broadcast_to(rs_w[None, :], (S, c))
        recip_w = recip[rs_b - 1, sf_cand]
        climit = (1 << rs_w).astype(jnp.int32)
        qt_off = qt_offsets[rs_w] + climit
        dqt_base = ((rs_b - 1) * n_sf + sf_cand) * 256

        hh = jnp.broadcast_to(hist[None], (S, c, 4))
        ww = jnp.broadcast_to(wts[None], (S, c, 4))
        rank0 = jnp.zeros((S, c), dtype=jnp.uint64)

        def sample_step(inner, sample):
            hh, ww, rank = inner
            sample_b = jnp.broadcast_to(sample[None, :], (S, c))
            pred = lms.predict(hh, ww)
            residual = sample_b - pred
            scaled = sea_div(residual, recip_w)
            clamped = jnp.clip(scaled, -climit[None, :], climit[None, :])
            q = jnp.take(qtab, qt_off[None, :] + clamped)
            dq = jnp.take(dqt_flat, dqt_base + q)
            recon = lms.clamp_i16(pred + dq)
            err = (sample_b - recon).astype(jnp.int64)
            esq = (err * err).astype(jnp.uint64)
            rank = rank + esq + lms.weights_penalty(ww)
            hh, ww = lms.update(hh, ww, recon, dq)
            return (hh, ww, rank), rank  # ys: rank AFTER each sample

        (hh, ww, ranks), rank_t = jax.lax.scan(sample_step, (hh, ww, rank0), smp)
        best = jnp.argmin(ranks, axis=0).astype(jnp.int32)
        best_sf = jnp.take_along_axis(sf_cand, best[None, :], axis=0)[0]
        best_rank = jnp.take_along_axis(ranks, best[None, :], axis=0)[0]  # [C]
        new_hist = jnp.take_along_axis(hh, best[None, :, None], axis=0)[0]
        new_wts = jnp.take_along_axis(ww, best[None, :, None], axis=0)[0]
        # survivors after k samples (oracle bound): partial <= winner final
        surv = jnp.stack(
            [
                jnp.sum(rank_t[k - 1] <= best_rank[None, :], axis=0)
                for k in KS
            ]
        )  # [len(KS), C] int
        return (new_hist, new_wts, best_sf), surv

    (_h, _w, _p), surv = jax.lax.scan(
        window_body, (hist0, wts0, prev_sf0), (samples_w, rs)
    )
    return surv  # [W, len(KS), C]


def part_a():
    print("== A. survivor statistics (oracle bound; no realizable kernel "
          "can prune more) ==")
    c = 16  # 8 stereo files' lanes
    w = 1024
    frames = w * SFF
    streams = []
    for i in range(c // 2):
        sig = varied_signal(2, frames, seed=4000 + i).reshape(frames, 2)
        streams.append(sig)
    samples = np.concatenate(streams, axis=1).astype(np.int32)  # [frames, C]
    rs = np.full((w, c), 3, np.int32)
    hist0 = np.tile(lms.initial_history(1), (c, 1))
    wts0 = np.tile(lms.initial_weights(1), (c, 1))
    prev0 = np.zeros(c, np.int32)
    dqt_flat = jnp.asarray(tables.dqt_stacked(SFB).reshape(-1), jnp.int32)
    recip = jnp.asarray(
        np.stack([tables.reciprocals(rb, SFB) for rb in range(1, 9)]), jnp.int32
    )
    qtab = jnp.asarray(tables.quant_tab(), jnp.int32)
    qt_offsets = jnp.asarray(tables.quant_offsets(), jnp.int32)

    fn = jax.jit(survivor_stats_fn)
    surv = np.asarray(
        fn(jnp.asarray(samples), jnp.asarray(rs), jnp.asarray(hist0),
           jnp.asarray(wts0), jnp.asarray(prev0), dqt_flat, recip, qtab,
           qt_offsets)
    )  # [W, K, C]
    print(f"windows={w} lanes={c} sff={SFF} sfb={SFB} (S={S}) rs=3")
    print(f"{'k':>4} {'mean':>6} {'p50':>4} {'p95':>4} {'p99':>4} {'max':>4}"
          f" {'wmax<=4':>8} {'wmax<=8':>8}")
    for ki, k in enumerate(KS):
        sk = surv[:, ki, :]  # [W, C]
        wmax = sk.max(axis=1)  # per-window max over lanes (binding stat)
        print(f"{k:>4} {sk.mean():>6.2f} {int(np.percentile(sk, 50)):>4}"
              f" {int(np.percentile(sk, 95)):>4}"
              f" {int(np.percentile(sk, 99)):>4} {sk.max():>4}"
              f" {np.mean(wmax <= 4):>8.3f} {np.mean(wmax <= 8):>8.3f}")
    return surv


def part_b():
    print("\n== B. does step cost scale with S? (same kernel, sfb 3 vs 4 "
          "vs 5, identical lanes/windows) ==")
    from sea_codec_tpu.ops.pallas_encode import encode_windows_pallas

    c = 512
    w = 256
    frames = w * SFF
    sig = varied_signal(2, frames * c // 2, seed=7).reshape(frames, c)
    samples = jnp.asarray(sig.astype(np.int32))
    nv = jnp.full((w,), SFF, jnp.int32)
    for sfb in (3, 4, 5):
        rs = jnp.full((w, c), 3, jnp.int32)
        hist0 = jnp.asarray(np.tile(lms.initial_history(1), (c, 1)))
        wts0 = jnp.asarray(np.tile(lms.initial_weights(1), (c, 1)))
        prev0 = jnp.zeros(c, jnp.int32)
        args = (samples, rs, nv, hist0, wts0, prev0, SFF, sfb)
        out = encode_windows_pallas(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(encode_windows_pallas(*args))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        msps = frames * c / t / 1e6
        print(f"sfb={sfb} (S={1 << sfb}): {t * 1e3:7.2f} ms "
              f"= {msps:8.1f} Msamples-lane/s")


def part_c(surv):
    print("\n== C. cost model ==")
    step_ops = 60.0  # vector ops per sample step on [S, L] (kernel source)
    carried = 13  # h0-3 w0-3 rank_hi rank_lo sfval recip orig-idx
    stages = 10  # bitonic network over S=16
    ops_per_exchange = 3  # compare + 2 selects per carried register
    compact_ops = stages * carried * ops_per_exchange
    compact_steps = compact_ops / step_ops
    print(f"compaction network ~ {compact_ops:.0f} vector ops "
          f"~ {compact_steps:.1f} sample-steps (full-S)")
    for ki, k in enumerate(KS):
        sk = surv[:, ki, :]
        wmax = sk.max(axis=1)
        for sprime in (4, 8):
            frac_ok = float(np.mean(wmax <= sprime))
            # per window, in units of full-S sample steps:
            #   always: k (phase 1) + compaction
            #   ok windows: (sff-k) * S'/S
            #   fallback windows (bound failed): (sff-k) full again on top
            #   of the wasted phase-1+compaction
            cost = (k + compact_steps
                    + frac_ok * (SFF - k) * (sprime / S)
                    + (1 - frac_ok) * (SFF - k) * (1 + sprime / S))
            print(f"k={k:>2} S'={sprime}: P(all lanes prunable)={frac_ok:5.3f}"
                  f"  modeled cost {cost:5.1f} vs {SFF} steps "
                  f"({'WIN' if cost < SFF else 'LOSS'} {cost / SFF:4.2f}x)")


if __name__ == "__main__":
    surv = part_a()
    if "--tpu" in sys.argv:
        part_b()
    part_c(surv)
