"""Measure how often the weights penalty (lms.rs:53-62) is provably zero.

If max_i |w_i| <= 12287 then sum(w_i^2) <= 4*12287^2 = 603,881,476 <
0x900 << 18 = 603,979,776, so (sum >> 18) <= 0x8ff and the penalty is
EXACTLY zero -- no 64-bit arithmetic needed. The Pallas search kernel
spends ~60% of its per-step vector ops on the exact u64 penalty; if the
bound holds for every candidate x lane of a [S, L] tile, a per-step scalar
branch can skip all of it.

This script measures, on realistic encode content:
  - per-(step, window, channel): fraction where ANY candidate's weights
    break the bound (per-lane rate), and
  - per-(step, window): fraction where ANY candidate x channel breaks it
    (tile rate -- the granularity a whole-tile branch actually gets).

Run: JAX_PLATFORMS=cpu python scripts/exp_penalty_stats.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from sea_codec_tpu.ops import lms
from sea_codec_tpu.ops import tables
from sea_codec_tpu.ops.device_encode import sea_div
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal, varied_signal

BOUND = 12287


def encode_windows_stats(
    samples, rs, n_valid, hist0, wts0, prev_sf0,
    dqt_flat, recip, qtab, qt_offsets, scale_factor_frames, n_candidates,
):
    """device_encode.encode_windows_fn with per-step weight-bound outputs."""
    sff = scale_factor_frames
    s = n_candidates
    wc = rs.shape[0]
    c = samples.shape[1]
    n_sf = recip.shape[1]
    samples_w = samples.reshape(wc, sff, c)

    def window_body(carry, xs):
        hist, wts, prev_sf = carry
        smp, rs_w, nv = xs

        cand = jnp.arange(s, dtype=jnp.int32)
        sf_cand = (cand[:, None] + prev_sf[None, :]) % s
        rs_b = jnp.broadcast_to(rs_w[None, :], (s, c))
        recip_w = recip[rs_b - 1, sf_cand]
        climit = (1 << rs_w).astype(jnp.int32)
        qt_off = qt_offsets[rs_w] + climit
        dqt_base = ((rs_b - 1) * n_sf + sf_cand) * 256

        hh = jnp.broadcast_to(hist[None], (s, c, 4))
        ww = jnp.broadcast_to(wts[None], (s, c, 4))
        rank0 = jnp.zeros((s, c), dtype=jnp.uint64)

        def sample_step(inner, xt):
            hh, ww, rank = inner
            sample, valid = xt
            # stat: does any candidate break the penalty-free bound?
            wmax = jnp.max(jnp.abs(ww), axis=2)  # [S, C]
            lane_hot = jnp.max(wmax, axis=0) > BOUND  # [C]
            sample_b = jnp.broadcast_to(sample[None, :], (s, c))
            pred = lms.predict(hh, ww)
            residual = sample_b - pred
            scaled = sea_div(residual, recip_w)
            clamped = jnp.clip(scaled, -climit[None, :], climit[None, :])
            q = jnp.take(qtab, qt_off[None, :] + clamped)
            dq = jnp.take(dqt_flat, dqt_base + q)
            recon = lms.clamp_i16(pred + dq)
            err = (sample_b - recon).astype(jnp.int64)
            esq = (err * err).astype(jnp.uint64)
            pen = lms.weights_penalty(ww)
            rank_inc = esq + pen
            rank = jnp.where(valid, rank + rank_inc, rank)
            pen_hot = jnp.max(jnp.where(pen > 0, 1, 0), axis=0) > 0  # [C]
            hh2, ww2 = lms.update(hh, ww, recon, dq)
            hh = jnp.where(valid, hh2, hh)
            ww = jnp.where(valid, ww2, ww)
            return (hh, ww, rank), (lane_hot, pen_hot)

        valid_t = jnp.arange(sff, dtype=jnp.int32) < nv
        (hh, ww, ranks), (lane_hot, pen_hot) = jax.lax.scan(
            sample_step, (hh, ww, rank0), (smp, valid_t)
        )
        best = jnp.argmin(ranks, axis=0).astype(jnp.int32)
        best_sf = jnp.take_along_axis(sf_cand, best[None, :], axis=0)[0]
        new_hist = jnp.take_along_axis(hh, best[None, :, None], axis=0)[0]
        new_wts = jnp.take_along_axis(ww, best[None, :, None], axis=0)[0]
        return (new_hist, new_wts, best_sf), (lane_hot, pen_hot)

    _, (lane_hot, pen_hot) = jax.lax.scan(
        window_body, (hist0, wts0, prev_sf0), (samples_w, rs, n_valid)
    )
    return lane_hot, pen_hot  # [W, sff, C] bool each


def run(name, pcm, channels, residual_size, sfb=4, sff=20):
    frames = pcm.shape[0] // channels
    wc = frames // sff
    frames = wc * sff
    x = np.asarray(pcm[: frames * channels], np.int32).reshape(frames, channels)
    rs = np.full((wc, channels), residual_size, np.int32)
    nv = np.full(wc, sff, np.int32)
    h0 = np.tile(lms.initial_history(1), (channels, 1)).astype(np.int32)
    w0 = np.tile(lms.initial_weights(1), (channels, 1)).astype(np.int32)
    p0 = np.zeros(channels, np.int32)
    sfbn = 1 << sfb
    dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)
    recip = jnp.asarray(
        np.stack([tables.reciprocals(rb, sfb) for rb in range(1, 9)]), jnp.int32
    )
    qtab = jnp.asarray(tables.quant_tab(), jnp.int32)
    qt_off = jnp.asarray(tables.quant_offsets(), jnp.int32)

    fn = jax.jit(
        encode_windows_stats,
        static_argnames=("scale_factor_frames", "n_candidates"),
    )
    lane_hot, pen_hot = fn(
        jnp.asarray(x), jnp.asarray(rs), jnp.asarray(nv),
        jnp.asarray(h0), jnp.asarray(w0), jnp.asarray(p0),
        dqt_flat, recip, qtab, qt_off,
        scale_factor_frames=sff, n_candidates=sfbn,
    )
    lane_hot = np.asarray(lane_hot)  # [W, sff, C]
    pen_hot = np.asarray(pen_hot)
    steps = lane_hot.shape[0] * lane_hot.shape[1]
    tile_rate = lane_hot.any(axis=2).mean()  # any lane hot -> tile pays
    lane_rate = lane_hot.mean()
    pen_rate = pen_hot.mean()
    print(
        f"{name:42s} rs={residual_size} ch={channels}: "
        f"tile-hot {tile_rate * 100:6.2f}%  lane-hot {lane_rate * 100:6.2f}%  "
        f"pen>0 {pen_rate * 100:6.3f}%  ({steps} steps)"
    )
    return tile_rate


if __name__ == "__main__":
    n = 8 * 5120
    for rs_ in (1, 2, 3, 5, 8):
        run("varied_signal (bench corpus content)",
            varied_signal(2, n, seed=7), 2, rs_)
    for rs_ in (1, 3, 8):
        run("gen_test_signal (reference test signal)",
            gen_test_signal(2, n), 2, rs_)
    # loud noise: hardest realistic case for predictor stability
    rng = np.random.default_rng(0)
    noise = rng.integers(-32000, 32000, size=n * 2).astype(np.int16)
    for rs_ in (1, 3, 8):
        run("full-scale uniform noise", noise, 2, rs_)
    # pure silence and a pure sine for completeness
    run("silence", np.zeros(n * 2, np.int16), 2, 3)
    t = np.arange(n)
    sine = (np.sin(t / 3.1) * 30000).astype(np.int16)
    sine2 = np.stack([sine, sine], 1).reshape(-1)
    run("loud sine", sine2, 2, 3)
