"""Compare lowerings for the VBR per-sample window gather on TPU."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timeit(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    n, count = 12288, 10240
    b = 3300  # ~2.57 bits/sample packed section
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, size=(n, b), dtype=np.uint8))
    widths = jnp.asarray(rng.integers(2, 4, size=(n, count), dtype=np.int32))
    ns = n * count

    # V1: take_along_axis on the 16-bit sliding window (current)
    @jax.jit
    def v1(data, widths):
        d = data.astype(jnp.int32)
        u16 = (d << 8) | jnp.pad(d[:, 1:], ((0, 0), (0, 1)))
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        win = jnp.take_along_axis(u16, offsets >> 3, axis=1)
        shift = jnp.int32(16) - (offsets & 7) - widths
        mask = (jnp.int32(1) << widths) - 1
        return ((win >> shift) & mask).astype(jnp.uint8)

    t1 = timeit(lambda: np.asarray(v1(data, widths)[0, 0]))
    print(f"V1 take_along_axis:   {t1*1e3:8.1f} ms  {ns/t1/1e6:7.1f} Msps", file=sys.stderr, flush=True)

    # V2: flat 1D take with global indices
    @jax.jit
    def v2(data, widths):
        d = data.astype(jnp.int32)
        u16 = ((d << 8) | jnp.pad(d[:, 1:], ((0, 0), (0, 1)))).reshape(-1)
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        gidx = (offsets >> 3) + (jnp.arange(n, dtype=jnp.int32) * b)[:, None]
        win = jnp.take(u16, gidx.reshape(-1)).reshape(n, count)
        shift = jnp.int32(16) - (offsets & 7) - widths
        mask = (jnp.int32(1) << widths) - 1
        return ((win >> shift) & mask).astype(jnp.uint8)

    t2 = timeit(lambda: np.asarray(v2(data, widths)[0, 0]))
    print(f"V2 flat take:         {t2*1e3:8.1f} ms  {ns/t2/1e6:7.1f} Msps", file=sys.stderr, flush=True)

    # V3: one-hot matmul extraction (MXU): window w of each row as
    # sum_j u16[j] * onehot(byte_idx == j). count x b matmul per row is too
    # big; instead segment rows into 128-col tiles and contract. (Skipped:
    # b=3300 makes this 33x the FLOPs of the whole decode -- measure anyway
    # at small scale? no.)

    # V4: dynamic_slice per window + in-window extraction.
    # Window structure: sff frames x C channels; per-(row, window) widths
    # constant per channel. Gather the window's byte span as aligned int32
    # words via take (few per window), then extract with select chains.
    # Here: approximate cost by gathering 12 int32 words per 40-sample
    # window.
    w_count = count // 40

    @jax.jit
    def v4_gather_only(data, widths):
        d32 = jax.lax.bitcast_convert_type(
            data.reshape(n, b // 4, 4), jnp.int32
        ) if False else data.astype(jnp.int32)  # placeholder
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        wstart = offsets[:, ::40]  # [n, w_count] window bit starts
        base = (wstart >> 5)  # int32-word index
        j = jnp.arange(12, dtype=jnp.int32)
        gidx = base[:, :, None] + j[None, None, :]
        gidx = jnp.minimum(gidx, b // 4 - 1)
        words = jnp.take_along_axis(
            d32[:, : (b // 4)], gidx.reshape(n, -1), axis=1
        )
        return words

    t4 = timeit(lambda: np.asarray(v4_gather_only(data, widths)[0, 0]))
    print(f"V4 window-word gather:{t4*1e3:8.1f} ms  ({w_count*12*n/1e6:.0f}M elems)", file=sys.stderr, flush=True)

    # V5: ONE lax.gather with contiguous slices: one index per window, span
    # int32 words per slice (per-index cost amortized over the slice).
    span = 12
    bw = b // 4

    @jax.jit
    def v5_gather_only(data, widths):
        d = data.astype(jnp.int32)
        pad = jnp.pad(d[:, 1:], ((0, 0), (0, 1)))
        d32 = d * 0x1000000 + pad  # stand-in word build (cost-equivalent)
        d32 = d32[:, :bw]
        flat = d32.reshape(-1)
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        wstart = offsets[:, ::40]
        word0 = jnp.minimum(wstart >> 5, bw - span)
        g = word0 + (jnp.arange(n, dtype=jnp.int32) * bw)[:, None]
        out = jax.lax.gather(
            flat,
            g.reshape(-1, 1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(span,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return out  # [n*w_count, span]

    t5 = timeit(lambda: np.asarray(v5_gather_only(data, widths)[0, 0]))
    print(f"V5 slice gather:      {t5*1e3:8.1f} ms  ({w_count*n/1e6:.1f}M slices x {span})", file=sys.stderr, flush=True)

    # V5b: wider slices, fewer indices (4-window groups)
    span4 = 44

    @jax.jit
    def v5b_gather_only(data, widths):
        d = data.astype(jnp.int32)
        pad = jnp.pad(d[:, 1:], ((0, 0), (0, 1)))
        d32 = (d * 0x1000000 + pad)[:, :bw]
        flat = d32.reshape(-1)
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        wstart = offsets[:, ::160]
        word0 = jnp.minimum(wstart >> 5, bw - span4)
        g = word0 + (jnp.arange(n, dtype=jnp.int32) * bw)[:, None]
        out = jax.lax.gather(
            flat,
            g.reshape(-1, 1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(span4,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return out

    t5b = timeit(lambda: np.asarray(v5b_gather_only(data, widths)[0, 0]))
    print(f"V5b 4-win slices:     {t5b*1e3:8.1f} ms  ({w_count*n/4e6:.1f}M slices x {span4})", file=sys.stderr, flush=True)

    # V6: V4's window-word gather but along the MAJOR axis (rows on lanes)
    @jax.jit
    def v6_gather_only(data, widths):
        d32 = data.astype(jnp.int32)[:, : (b // 4)].T  # [BW, N]
        offsets = jnp.cumsum(widths, axis=1, dtype=jnp.int32) - widths
        wstart = offsets[:, ::40]  # [n, w_count]
        base = wstart >> 5
        j = jnp.arange(12, dtype=jnp.int32)
        gidx = base[:, :, None] + j[None, None, :]
        gidx = jnp.minimum(gidx, b // 4 - 1)  # [n, w_count, 12]
        gt = gidx.reshape(n, -1).T  # [w_count*12, N]
        words = jnp.take_along_axis(d32, gt, axis=0)
        return words

    t6 = timeit(lambda: np.asarray(v6_gather_only(data, widths)[0, 0]))
    print(f"V6 major-axis gather: {t6*1e3:8.1f} ms  ({w_count*12*n/1e6:.0f}M elems)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
