"""Whole-file encoding as a single compiled program.

The session encoder (one device call per chunk) pays per-call dispatch
overhead ~256 times per file. Here the sequential chunk chain is expressed
as a ``lax.scan`` whose body encodes one full chunk (itself a window-grid
kernel: Pallas on TPU, the XLA scan elsewhere), so an entire file's encode --
including the VBR two-pass with its on-device error ranking -- is ONE jitted
program. Per-chunk LMS entry states (needed for the chunk headers) fall out
of the scan carry.

VBR specifics mirror ``models/vbr.py`` exactly: pass 1 at base+1 bits from
the current state, LMS restored but prev_sf kept (reference
``encoder_vbr.rs:168``), stable error ranking, distribution counts static
per full chunk, sizes capped at 8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import tables
from .device_encode import encode_windows_fn


def _window_kernel(use_pallas: bool, sff: int, sfb: int, ranks_only: bool = False):
    if use_pallas:
        from .pallas_encode import encode_windows_pallas_fn

        def run(samples, rs, n_valid, hist, wts, prev):
            return encode_windows_pallas_fn(
                samples, rs, n_valid, hist, wts, prev,
                scale_factor_frames=sff, scale_factor_bits=sfb,
                ranks_only=ranks_only,
            )

        return run

    dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32)
    recip = jnp.asarray(tables.reciprocals_stacked(sfb), jnp.int32)
    qtab = jnp.asarray(tables.quant_tab(), jnp.int32)
    qt_offsets = jnp.asarray(tables.quant_offsets(), jnp.int32)

    def run(samples, rs, n_valid, hist, wts, prev):
        return encode_windows_fn(
            samples, rs, n_valid, hist, wts, prev,
            dqt_flat, recip, qtab, qt_offsets,
            scale_factor_frames=sff, n_candidates=1 << sfb,
        )

    return run


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "residual_size",
        "use_pallas",
        "interpret",
    ),
)
def encode_file_cbr(
    samples: jnp.ndarray,  # int32[nc, fpc, C] full chunks only
    hist0: jnp.ndarray,  # int32[C, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[C]
    scale_factor_frames: int,
    scale_factor_bits: int,
    residual_size: int,
    use_pallas: bool,
    interpret: bool = False,  # Pallas interpret mode (tests on CPU)
):
    nc, fpc, c = samples.shape
    sff = scale_factor_frames
    w = fpc // sff
    rs = jnp.full((w, c), residual_size, jnp.int32)
    nv = jnp.full((w,), sff, jnp.int32)

    if use_pallas:
        from .pallas_encode import (
            pack_state,
            prepare_n_valid,
            prepare_window_streams,
            run_window_search,
        )

        s = 1 << scale_factor_bits
        # CBR streams are identical for every chunk: hoist out of the scan.
        streams, wb, wp = prepare_window_streams(rs, sff, scale_factor_bits, c)
        nv_p = prepare_n_valid(nv, wp, c)
        state0 = pack_state(hist0, wts0, prev0, s, c)
        # full chunks only: every real window is full, so the mask-free
        # kernel is statically legal whenever there are no padded windows
        av = wp == w

        def body(state, smp):
            codes_p, sf_p, _ranks_p, state_out = run_window_search(
                state, smp.reshape(fpc, c).astype(jnp.int32), nv_p, streams, wb, wp,
                sff, scale_factor_bits, c, all_valid=av, interpret=interpret,
            )
            sf = sf_p[:w, 0, :c].astype(jnp.uint8)
            codes = codes_p[:w, :sff, :c].reshape(fpc, c).astype(jnp.uint8)
            ehist = state[0:4, 0, :c].T
            ewts = state[4:8, 0, :c].T
            return state_out, (sf, codes, ehist, ewts)

        state, (sf, codes, ehist, ewts) = jax.lax.scan(body, state0, samples)
        hist = state[0:4, 0, :c].T
        wts = state[4:8, 0, :c].T
        prev = state[8, 0, :c].astype(jnp.int32)
        return sf, codes, ehist, ewts, hist, wts, prev

    run = _window_kernel(False, sff, scale_factor_bits)

    def body(carry, smp):
        hist, wts, prev = carry
        sf, codes, _ranks, h2, w2, p2 = run(
            smp.reshape(fpc, c).astype(jnp.int32), rs, nv, hist, wts, prev
        )
        return (h2, w2, p2), (sf, codes, hist, wts)

    (hist, wts, prev), (sf, codes, ehist, ewts) = jax.lax.scan(
        body, (hist0, wts0, prev0), samples
    )
    return sf, codes, ehist, ewts, hist, wts, prev


def _nv_pallas_layout(nv: jnp.ndarray, wp: int) -> jnp.ndarray:
    """[nc, W, B] per-lane window lengths -> the kernel's [nc, WP, 1, L]."""
    nc, w, b = nv.shape
    l = -(-b // 128) * 128
    out = jnp.zeros((nc, wp, 1, l), jnp.int32)
    return out.at[:, :w, 0, :b].set(nv)


def _corpus_cbr_scan(
    samples: jnp.ndarray,  # int16[nc, fpc, B] -- B lanes = files x channels
    nv: jnp.ndarray,  # int32[nc, W, B] per-chunk per-window per-lane lengths
    hist0: jnp.ndarray,  # int32[B, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[B]
    scale_factor_frames: int,
    scale_factor_bits: int,
    residual_size: int,
    use_pallas: bool,
    interpret: bool = False,  # Pallas interpret mode (tests on CPU)
):
    """Corpus CBR encode core: many independent streams packed into kernel
    lanes (each lane = one channel of one file, with its own LMS carry and
    its own per-window valid-length mask). Pallas on TPU; the XLA window
    kernel elsewhere (same semantics, also the mesh-shardable form)."""
    nc, fpc, b = samples.shape
    sff = scale_factor_frames
    w = fpc // sff
    rs = jnp.full((w, b), residual_size, jnp.int32)

    if use_pallas:
        from .pallas_encode import (
            pack_state,
            prepare_window_streams,
            run_window_search,
        )

        s = 1 << scale_factor_bits
        streams, wb, wp = prepare_window_streams(rs, sff, scale_factor_bits, b)
        nv_all = _nv_pallas_layout(nv, wp)
        state0 = pack_state(hist0, wts0, prev0, s, b)
        # per-chunk fast path: most corpus chunks are fully valid on every
        # lane, where the mask-free kernel applies (bit-equal; ~5% faster).
        # Requires no padded windows (static) and all-full nv (dynamic).
        can_av = wp == w
        all_full = jnp.all(nv == sff, axis=(1, 2))  # bool[nc]

        def body(state, xs):
            smp, nvk, af = xs
            flat = smp.reshape(fpc, b).astype(jnp.int32)

            def run(av):
                return lambda: run_window_search(
                    state, flat, nvk, streams,
                    wb, wp, sff, scale_factor_bits, b, all_valid=av,
                    interpret=interpret,
                )

            if can_av:
                codes_p, sf_p, _ranks, state_out = jax.lax.cond(
                    af, run(True), run(False)
                )
            else:
                codes_p, sf_p, _ranks, state_out = run(False)()
            sf = sf_p[:w, 0, :b].astype(jnp.uint8)
            codes = codes_p[:w, :sff, :b].reshape(fpc, b).astype(jnp.uint8)
            ehist = state[0:4, 0, :b].T
            ewts = state[4:8, 0, :b].T
            return state_out, (sf, codes, ehist, ewts)

        state, (sf, codes, ehist, ewts) = jax.lax.scan(
            body, state0, (samples, nv_all, all_full)
        )
        hist = state[0:4, 0, :b].T
        wts = state[4:8, 0, :b].T
        prev = state[8, 0, :b].astype(jnp.int32)
        return sf, codes, ehist, ewts, hist, wts, prev

    run = _window_kernel(False, sff, scale_factor_bits)

    def body(carry, xs):
        hist, wts, prev = carry
        smp, nvk = xs  # [fpc, B], [W, B]
        sf, codes, _ranks, h2, w2, p2 = run(
            smp.reshape(fpc, b).astype(jnp.int32), rs, nvk, hist, wts, prev
        )
        return (h2, w2, p2), (sf, codes, hist, wts)

    (hist, wts, prev), (sf, codes, ehist, ewts) = jax.lax.scan(
        body, (hist0, wts0, prev0), (samples, nv)
    )
    return sf, codes, ehist, ewts, hist, wts, prev


encode_corpus_cbr = partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames", "scale_factor_bits", "residual_size", "use_pallas",
        "interpret",
    ),
)(_corpus_cbr_scan)


def corpus_n_valid(
    frames: jnp.ndarray,  # int32[B] per-lane frame counts (padding lanes 0)
    nc: int,
    fpc: int,
    sff: int,
    full_only: bool,
) -> jnp.ndarray:
    """Per-chunk per-window per-lane valid frame counts [nc, W, B], built on
    device (uploading the dense mask cost ~10% of the corpus transfer).
    ``full_only`` masks ragged tail chunks entirely (the VBR fused path
    encodes full chunks only)."""
    b = frames.shape[0]
    w = fpc // sff
    k = jnp.arange(nc, dtype=jnp.int32).reshape(nc, 1, 1)
    wi = jnp.arange(w, dtype=jnp.int32).reshape(1, w, 1)
    fr = frames.reshape(1, 1, b).astype(jnp.int32)
    in_chunk = jnp.clip(fr - k * fpc, 0, fpc)  # frames present in chunk k
    if full_only:
        in_chunk = jnp.where(in_chunk == fpc, fpc, 0)
    return jnp.clip(in_chunk - wi * sff, 0, sff)


def _corpus_cbr_packed_core(
    samples: jnp.ndarray,  # int16[nc, fpc, B]
    frames: jnp.ndarray,  # int32[B] per-lane frame counts
    tail_idx: jnp.ndarray,  # int32[n_files] index of each file's tail chunk
    hist0: jnp.ndarray,  # int32[B, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[B]
    scale_factor_frames: int,
    scale_factor_bits: int,
    residual_size: int,
    n_files: int,
    use_pallas: bool,
):
    """Fused corpus CBR encode + on-device container serialization.

    Returns (rows uint8[nf, nc, chunk_size] finished full-chunk container
    rows, tail_sf [nf, W, C], tail_codes [nf, fpc, C], tail_eh/tail_ew
    [nf, C, 4] gathered at each file's tail chunk, final hist/wts/prev).
    The host slices each file's real rows and serializes only the ragged
    tail chunk itself.
    """
    from .serialize_device import corpus_rows_cbr_device

    nc, fpc, b = samples.shape
    sff = scale_factor_frames
    w = fpc // sff
    nf = n_files
    c = b // nf
    nv = corpus_n_valid(frames, nc, fpc, sff, full_only=False)
    sf, codes, ehist, ewts, hist, wts, prev = _corpus_cbr_scan(
        samples, nv, hist0, wts0, prev0,
        scale_factor_frames, scale_factor_bits, residual_size, use_pallas,
    )
    rows = corpus_rows_cbr_device(
        sf, codes, ehist, ewts, nf,
        scale_factor_bits, sff, residual_size,
    )
    # tail-chunk gathers in per-file layout [nf, nc, ...]
    sf_f = sf.reshape(nc, w, nf, c).transpose(2, 0, 1, 3)  # [nf, nc, w, c]
    codes_f = codes.reshape(nc, fpc, nf, c).transpose(2, 0, 1, 3)
    eh_f = ehist.reshape(nc, nf, c, 4).transpose(1, 0, 2, 3)
    ew_f = ewts.reshape(nc, nf, c, 4).transpose(1, 0, 2, 3)
    ti = jnp.clip(tail_idx, 0, nc - 1)
    tail_sf = jnp.take_along_axis(sf_f, ti[:, None, None, None], axis=1)[:, 0]
    tail_codes = jnp.take_along_axis(codes_f, ti[:, None, None, None], axis=1)[:, 0]
    tail_eh = jnp.take_along_axis(eh_f, ti[:, None, None, None], axis=1)[:, 0]
    tail_ew = jnp.take_along_axis(ew_f, ti[:, None, None, None], axis=1)[:, 0]
    return rows, tail_sf, tail_codes, tail_eh, tail_ew, hist, wts, prev


encode_corpus_cbr_packed = partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "residual_size",
        "n_files",
        "use_pallas",
    ),
)(_corpus_cbr_packed_core)


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "residual_size",
        "n_files",
        "use_pallas",
    ),
)
def encode_corpus_cbr_packed_blocks(
    samples: jnp.ndarray,  # int16[NB, nc, fpc, B] -- NB independent lane blocks
    frames: jnp.ndarray,  # int32[NB, B]
    tail_idx: jnp.ndarray,  # int32[NB, n_files]
    hist0: jnp.ndarray,  # int32[NB, B, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[NB, B]
    scale_factor_frames: int,
    scale_factor_bits: int,
    residual_size: int,
    n_files: int,
    use_pallas: bool,
):
    """Many lane blocks in ONE device program (``lax.map`` over blocks).

    On a relay-attached TPU every dispatch/transfer pays tens of
    milliseconds of per-RPC latency; batching G blocks into one
    put/execute/fetch round amortizes that over G x 128 lanes. Device time
    is the same as G sequential kernels (the blocks serialize on the one
    TensorCore); the win is pure round-trip elimination.
    """

    def one(args):
        return _corpus_cbr_packed_core(
            *args,
            scale_factor_frames=scale_factor_frames,
            scale_factor_bits=scale_factor_bits,
            residual_size=residual_size,
            n_files=n_files,
            use_pallas=use_pallas,
        )

    return jax.lax.map(one, (samples, frames, tail_idx, hist0, wts0, prev0))


def _corpus_vbr_scan(
    samples: jnp.ndarray,  # int16[nc, fpc, B]
    nv: jnp.ndarray,  # int32[nc, W, B]; tail/padding chunks all-zero
    hist0: jnp.ndarray,  # int32[B, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[B]
    scale_factor_frames: int,
    scale_factor_bits: int,
    base: int,
    dist: tuple,  # (m1, p1, p2) static distribution counts for full chunks
    n_files: int,
    use_pallas: bool,
    interpret: bool = False,  # Pallas interpret mode (tests on CPU)
):
    """Corpus VBR encode: the two-pass search with *per-file* on-device error
    ranking (each file's windows x channels rank independently, exactly like
    per-file encoding). Only full chunks ride this path; ragged tails are
    masked out via nv and encoded by the caller. Pallas on TPU; the XLA
    window kernel elsewhere (same semantics, mesh-shardable)."""
    nc, fpc, b = samples.shape
    sff = scale_factor_frames
    w = fpc // sff
    nf = n_files
    c = b // nf
    m1, p1, p2 = dist
    sortable = (fpc * c) // sff

    def choose(errors):  # [w*c] uint64 for one file, window-major
        order = jnp.argsort(errors[:sortable], stable=True)
        sizes = jnp.full((w * c,), base, jnp.int32)
        if m1:
            sizes = sizes.at[order[:m1]].set(base - 1)
        if p1:
            sizes = sizes.at[order[sortable - p2 - p1 : sortable - p2]].set(base + 1)
        if p2:
            sizes = sizes.at[order[sortable - p2 :]].set(base + 2)
        return jnp.clip(sizes, 1, 8)

    def sizes_from_errors(errors):  # [w, B] uint64 -> rs2 [w, B] int32
        err_f = errors.reshape(w, nf, c).transpose(1, 0, 2).reshape(nf, w * c)
        sizes_f = jax.vmap(choose)(err_f)  # [nf, w*c]
        return sizes_f.reshape(nf, w, c).transpose(1, 0, 2).reshape(w, b)

    if use_pallas:
        from .pallas_encode import (
            pack_state,
            prepare_window_streams,
            run_window_search,
        )

        s = 1 << scale_factor_bits
        rs1 = jnp.full((w, b), base + 1, jnp.int32)
        streams1, wb, wp = prepare_window_streams(rs1, sff, scale_factor_bits, b)
        nv_all = _nv_pallas_layout(nv, wp)
        state0 = pack_state(hist0, wts0, prev0, s, b)
        # VBR fused chunks are either fully valid or fully masked (tails are
        # full_only-masked to zero); the all-full ones take the mask-free
        # kernel on both passes (bit-equal; ~5% faster)
        can_av = wp == w
        all_full = jnp.all(nv == sff, axis=(1, 2))  # bool[nc]

        def body(state, xs):
            smp, nvk, af = xs
            flat = smp.reshape(fpc, b).astype(jnp.int32)

            def passes(av):
                def go():
                    # pass 1: analyze at base+1 from the carried state
                    # ranks_only: the analyze pass reads only ranks + state
                    _c1, _s1, ranks_p, state1 = run_window_search(
                        state, flat, nvk, streams1, wb, wp, sff,
                        scale_factor_bits, b, all_valid=av,
                        interpret=interpret, ranks_only=True,
                    )
                    hi = ranks_p[:w, 0, :b].astype(jnp.uint32).astype(jnp.uint64)
                    lo = ranks_p[:w, 1, :b].astype(jnp.uint32).astype(jnp.uint64)
                    rs2 = sizes_from_errors((hi << jnp.uint64(32)) | lo)
                    streams2, _wb2, _wp2 = prepare_window_streams(
                        rs2, sff, scale_factor_bits, b
                    )
                    # pass 2: LMS restored (rows 0..7 from carry), prev_sf
                    # from pass 1
                    state_p2 = jnp.concatenate([state[0:8], state1[8:9]], axis=0)
                    codes_p, sf_p, _r2, state2 = run_window_search(
                        state_p2, flat, nvk, streams2, wb, wp, sff,
                        scale_factor_bits, b, all_valid=av,
                        interpret=interpret,
                    )
                    return codes_p, sf_p, rs2, state2

                return go

            if can_av:
                codes_p, sf_p, rs2, state2 = jax.lax.cond(
                    af, passes(True), passes(False)
                )
            else:
                codes_p, sf_p, rs2, state2 = passes(False)()
            sf = sf_p[:w, 0, :b].astype(jnp.uint8)
            codes = codes_p[:w, :sff, :b].reshape(fpc, b).astype(jnp.uint8)
            ehist = state[0:4, 0, :b].T
            ewts = state[4:8, 0, :b].T
            return state2, (sf, codes, rs2.astype(jnp.uint8), ehist, ewts)

        state, (sf, codes, sizes, ehist, ewts) = jax.lax.scan(
            body, state0, (samples, nv_all, all_full)
        )
        hist = state[0:4, 0, :b].T
        wts = state[4:8, 0, :b].T
        prev = state[8, 0, :b].astype(jnp.int32)
        return sf, codes, sizes, ehist, ewts, hist, wts, prev

    run = _window_kernel(False, sff, scale_factor_bits)
    rs1 = jnp.full((w, b), base + 1, jnp.int32)

    def body(carry, xs):
        hist, wts, prev = carry
        smp, nvk = xs  # [fpc, B], [W, B]
        flat = smp.reshape(fpc, b).astype(jnp.int32)
        # pass 1: analyze at base+1; LMS restored, prev_sf kept from pass 1
        _sf1, _c1, ranks, _h1, _w1, prev1 = run(flat, rs1, nvk, hist, wts, prev)
        rs2 = sizes_from_errors(ranks)
        sf, codes, _r2, h2, w2, p2 = run(flat, rs2, nvk, hist, wts, prev1)
        return (h2, w2, p2), (sf, codes, rs2.astype(jnp.uint8), hist, wts)

    (hist, wts, prev), (sf, codes, sizes, ehist, ewts) = jax.lax.scan(
        body, (hist0, wts0, prev0), (samples, nv)
    )
    return sf, codes, sizes, ehist, ewts, hist, wts, prev


encode_corpus_vbr = partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "base",
        "dist",
        "n_files",
        "use_pallas",
        "interpret",
    ),
)(_corpus_vbr_scan)


def _corpus_vbr_nv_core(
    samples: jnp.ndarray,  # int16[nc, fpc, B]
    frames: jnp.ndarray,  # int32[B] per-lane frame counts
    hist0: jnp.ndarray,
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,
    scale_factor_frames: int,
    scale_factor_bits: int,
    base: int,
    dist: tuple,
    n_files: int,
    use_pallas: bool,
):
    """Corpus VBR encode with the valid-length mask built on device (only
    full chunks ride the fused scan; ragged tails are fully masked)."""
    nc, fpc, b = samples.shape
    sff = scale_factor_frames
    nv = corpus_n_valid(frames, nc, fpc, sff, full_only=True)
    return _corpus_vbr_scan(
        samples, nv, hist0, wts0, prev0,
        scale_factor_frames, scale_factor_bits, base, dist, n_files, use_pallas,
    )


encode_corpus_vbr_nv = partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "base",
        "dist",
        "n_files",
        "use_pallas",
    ),
)(_corpus_vbr_nv_core)


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "base",
        "dist",
        "n_files",
        "use_pallas",
    ),
)
def encode_corpus_vbr_nv_blocks(
    samples: jnp.ndarray,  # int16[NB, nc, fpc, B]
    frames: jnp.ndarray,  # int32[NB, B]
    hist0: jnp.ndarray,  # int32[NB, B, 4]
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,  # int32[NB, B]
    scale_factor_frames: int,
    scale_factor_bits: int,
    base: int,
    dist: tuple,
    n_files: int,
    use_pallas: bool,
):
    """VBR analog of ``encode_corpus_cbr_packed_blocks``: many lane blocks
    per device round trip (see that docstring for why)."""

    def one(args):
        smp, fr, h0, w0, p0 = args
        return _corpus_vbr_nv_core(
            smp, fr, h0, w0, p0,
            scale_factor_frames=scale_factor_frames,
            scale_factor_bits=scale_factor_bits,
            base=base,
            dist=dist,
            n_files=n_files,
            use_pallas=use_pallas,
        )

    return jax.lax.map(one, (samples, frames, hist0, wts0, prev0))


@partial(
    jax.jit,
    static_argnames=(
        "scale_factor_frames",
        "scale_factor_bits",
        "base",
        "dist",
        "use_pallas",
    ),
)
def encode_file_vbr(
    samples: jnp.ndarray,  # int32[nc, fpc, C]
    hist0: jnp.ndarray,
    wts0: jnp.ndarray,
    prev0: jnp.ndarray,
    scale_factor_frames: int,
    scale_factor_bits: int,
    base: int,  # trunc(normalized target bitrate)
    dist: tuple,  # (m1, p1, p2) distribution counts (static per full chunk)
    use_pallas: bool,
):
    nc, fpc, c = samples.shape
    sff = scale_factor_frames
    w = fpc // sff
    m1, p1, p2 = dist
    sortable = (fpc * c) // sff
    run = _window_kernel(use_pallas, sff, scale_factor_bits)
    run1 = _window_kernel(use_pallas, sff, scale_factor_bits, ranks_only=True)
    rs1 = jnp.full((w, c), base + 1, jnp.int32)
    nv = jnp.full((w,), sff, jnp.int32)

    def body(carry, smp):
        hist, wts, prev = carry
        flat = smp.reshape(fpc, c).astype(jnp.int32)
        # pass 1: analyze at base+1; LMS restored, prev_sf kept
        _sf1, _codes1, ranks, _h1, _w1, prev1 = run1(flat, rs1, nv, hist, wts, prev)
        errors = ranks.reshape(-1)  # [w*c] uint64, window-major channel-minor
        order = jnp.argsort(errors[:sortable], stable=True)
        sizes = jnp.full((w * c,), base, jnp.int32)
        if m1:
            sizes = sizes.at[order[:m1]].set(base - 1)
        if p1:
            sizes = sizes.at[order[sortable - p2 - p1 : sortable - p2]].set(base + 1)
        if p2:
            sizes = sizes.at[order[sortable - p2 :]].set(base + 2)
        sizes = jnp.clip(sizes, 1, 8)  # see models/vbr.py on the size clamps
        rs2 = sizes.reshape(w, c)
        sf, codes, _ranks2, h2, w2, p2_ = run(flat, rs2, nv, hist, wts, prev1)
        return (h2, w2, p2_), (sf, codes, sizes.astype(jnp.uint8), hist, wts)

    (hist, wts, prev), (sf, codes, sizes, ehist, ewts) = jax.lax.scan(
        body, (hist0, wts0, prev0), samples
    )
    return sf, codes, sizes, ehist, ewts, hist, wts, prev
