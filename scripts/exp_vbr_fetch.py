"""Experiment: where do the VBR fetch's 61.5 ms go, and what helps?

perf_vbr_attribution put the one-hot MXU word fetch at 61.5 ms of the
114 ms fused VBR decode (503 Msamples) -- ~3% MXU utilization on the
padded shapes ([256, 128] x [128, 128] per chunk, batched 49152 times).
Candidate explanations: per-batch weight-reload overhead on tiny batched
matmuls, one-hot materialization traffic, lax.map block serialization,
or the int32->bf16/f32->int32 conversions around the dot.

Pieces timed here (production geometry: N=49152 base8 rows from real VBR
streams' group offsets, WG=256, k1=89, n_words=14):
  A. one-hot build alone (compare + convert, materialized)
  B. batched dot alone on a prebuilt one-hot
  C. full current fetch (baseline)
  D. fetch with larger row blocks (8192, 16384)
  E. g-merge: g chunks' streams stacked along K (block-diagonal one-hot),
     M = g*WG, batch N/g -- fewer, bigger matmuls at g x padded-K waste
  F. one-hot in the dot's preferred layout without lax.map (single dot
     over the whole batch, XLA chooses blocking)
  G. fused one-hot + dot with NO lax.map (XLA blocks the whole batch)

Every variant asserts word-exact equality against the baseline output.
Usage: python scripts/exp_vbr_fetch.py [mult]  (default 768 = bench shape)

RESULTS (TPU v5e, n=49152, k1=87, 503 Msamples-equivalent, 2026-08-18):
  C baseline (blocked map)      58.4 ms   8.6 Gsps-equiv
  A one-hot build alone         31.0 ms
  B dot alone blk=4096/8192/16k 46.1 / 46.5 / 46.4 ms
  F dot single on prebuilt 1-hot 35.5 ms
  E g-merge g=2/4/8             69.3 / 70.5 / 72.0 ms  (all exact, all REJECT:
     block-diagonal K multiplies FLOPs faster than bigger M repays dispatch)
  G fused no-map                42.8 ms (without word assembly); in-place A/B
     with production transposed layout + assembly: 64.6 vs 69.0 ms (+7%)
Verdict: INTEGRATED as the `nomap` fast path in _fetch_neighborhood_matmul
(auto-gated on the materialized-one-hot HBM bound; blocked map kept as the
huge-batch fallback, both paths pinned equal by
tests/test_pallas.py::test_fetch_matmul_nomap_matches_blocked). The dot is
latency-bound at ~1-3%% MXU utilization on [256,87]x[87,56] tiles; merging
chunks to feed bigger tiles loses to the padded-K FLOP waste, so ~43 ms is
the practical floor for this addressing scheme.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from sea_codec_tpu.batch import parsed_concat
from sea_codec_tpu.native.binding import native_encode
from sea_codec_tpu.ops.device_decode import _fetch_neighborhood_matmul
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, varied_signal


def timeit(fn, reps=6):
    out = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        # force with a tiny fetch (relay: block_until_ready == enqueued)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    channels, fpc, bits = 2, 5120, 2.5
    files = [varied_signal(channels, 8 * fpc, seed=2000 + i) for i in range(8)]
    blobs = [
        native_encode(f, TEST_SAMPLE_RATE, channels, residual_bits=bits,
                      frames_per_chunk=fpc, vbr=True)
        for f in files
    ]
    _h, cfg, cat = parsed_concat(blobs)
    res_bytes = np.asarray(cat[0])
    n0, w, c = np.asarray(cat[2]).shape

    # The matmul's cost is data-independent (same shapes, same flops), so
    # time it with uniform monotone base8 rather than re-deriving the
    # production group-addressing prologue; exactness is still checked
    # variant-vs-baseline on identical inputs.
    per_chunk_bytes = res_bytes.shape[1]
    k1 = -(-per_chunk_bytes // 32)  # 8-word (32-byte) blocks per row
    wg = 256
    n_words = 14
    rng = np.random.default_rng(0)
    n = n0 * mult
    base8 = rng.integers(0, max(1, k1 - 2), size=(n, wg)).astype(np.int32)
    base8.sort(axis=1)  # monotone like real group offsets
    pad_to = 4 * (8 * k1 + n_words)
    data_np = np.zeros((n0, pad_to), np.uint8)
    data_np[:, :per_chunk_bytes] = res_bytes
    data = jax.block_until_ready(
        jax.jit(lambda x: jnp.tile(x, (mult, 1)))(jnp.asarray(data_np)))
    base8_d = jnp.asarray(base8)
    n_samples = n * fpc * c
    print(f"n={n} wg={wg} k1={k1} n_words={n_words} "
          f"({n_samples / 1e6:.0f} Msamples-equivalent)", file=sys.stderr)

    # ---- C. baseline ----
    fetch = jax.jit(lambda d, b: _fetch_neighborhood_matmul(d, b, k1, n_words))
    t = timeit(lambda: fetch(data, base8_d))
    ref = np.asarray(fetch(data, base8_d))
    print(f"C baseline fetch:            {t * 1e3:7.1f} ms  "
          f"{n_samples / t / 1e9:5.2f} Gsps-equiv", file=sys.stderr)

    # ---- A/B. split: one-hot build vs dot ----
    nw4 = n_words * 4

    def make_s(d_rows):
        planes = [d_rows[:, b::4] for b in range(4)]
        cols = []
        for p in range(n_words):
            for b4 in range(4):
                cols.append(planes[b4][:, p : p + 8 * k1 : 8])
        return jnp.stack(cols, axis=2).astype(jnp.bfloat16)

    iota_k = jnp.arange(k1, dtype=jnp.int32)

    @jax.jit
    def onehot_only(b8):
        return (b8[:, :, None] == iota_k[None, None, :]).astype(jnp.bfloat16)

    t = timeit(lambda: onehot_only(base8_d))
    print(f"A one-hot build alone:       {t * 1e3:7.1f} ms", file=sys.stderr)

    oh = jax.block_until_ready(onehot_only(base8_d))
    s_full = jax.block_until_ready(jax.jit(make_s)(data))

    def dot_blocked(blk):
        @jax.jit
        def run(ohx, sx):
            ohb = ohx.reshape(-1, blk, wg, k1)
            sb = sx.reshape(-1, blk, k1, nw4)

            def pick(a):
                return jax.lax.dot_general(
                    a[0], a[1],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            return jax.lax.map(pick, (ohb, sb))

        return run

    for blk in (4096, 8192, 16384):
        if n % blk:
            continue
        run = dot_blocked(blk)
        t = timeit(lambda r=run: r(oh, s_full))
        print(f"B dot alone blk={blk:5d}:     {t * 1e3:7.1f} ms",
              file=sys.stderr)

    # ---- F. single dot, no lax.map ----
    @jax.jit
    def dot_single(ohx, sx):
        return jax.lax.dot_general(
            ohx, sx,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    t = timeit(lambda: dot_single(oh, s_full))
    print(f"F dot single (XLA blocks):   {t * 1e3:7.1f} ms", file=sys.stderr)

    # ---- E. g-merge: block-diagonal K, bigger M ----
    for g in (2, 4, 8):
        kg = g * k1

        # build merged S: [n/g, g*k1, nw4] by concatenating along K
        @jax.jit
        def fetch_g(d, b8, g=g, kg=kg):
            s = make_s(d)  # [n, k1, nw4]
            sm = s.reshape(-1, g, k1, nw4).reshape(-1, kg, nw4)
            off = (jnp.arange(g, dtype=jnp.int32) * k1)[None, :, None]
            b8m = (b8.reshape(-1, g, wg) + off).reshape(-1, g * wg)
            iota = jnp.arange(kg, dtype=jnp.int32)
            blk = min(max(1, 4096 // g), b8m.shape[0])  # <=4096 chunks/block
            b8b = b8m.reshape(-1, blk, g * wg)
            sb = sm.reshape(-1, blk, kg, nw4)

            def pick(a):
                ohm = (a[0][:, :, None] == iota[None, None, :]).astype(
                    jnp.bfloat16
                )
                return jax.lax.dot_general(
                    ohm, a[1],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            out = jax.lax.map(pick, (b8b, sb))  # [nb, blk, g*wg, nw4]
            return out.reshape(n, wg, n_words, 4)

        t = timeit(lambda f=fetch_g: f(data, base8_d))
        out_g = np.asarray(fetch_g(data, base8_d))
        words_g = (
            (out_g[..., 0].astype(np.uint32) << 24)
            | (out_g[..., 1].astype(np.uint32) << 16)
            | (out_g[..., 2].astype(np.uint32) << 8)
            | out_g[..., 3].astype(np.uint32)
        )  # [N, WG, n_words]; baseline ref is [N, n_words, WG]
        ok = np.array_equal(np.moveaxis(words_g, 1, 2), ref)
        print(f"E g-merge g={g}:              {t * 1e3:7.1f} ms  exact={ok}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
