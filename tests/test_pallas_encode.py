"""Pallas encode-search kernel correctness (interpret mode on CPU).

Pins the integrated kernel -- cheap-rank arithmetic (exact narrow-domain
err^2 / weights-penalty forms) and the mask-free ``all_valid`` variant with
its per-chunk ``lax.cond`` dispatch -- against the independent XLA window
kernel (``ops.device_encode.encode_windows_fn``), which is itself pinned to
the upstream C oracle by test_oracle.py. Reference semantics:
``encoder_base.rs:94-144`` (search), ``lms.rs:33-62`` (predict/update/
penalty). The compiled TPU kernel is additionally bit-checked against the
native codec by every bench run and scripts/exp_encode_chain.py.
"""

from __future__ import annotations

from conftest import pallas_interpret

import numpy as np
import pytest

import jax.numpy as jnp

from sea_codec_tpu.ops import lms as lms_ops
from sea_codec_tpu.ops.encode_file import (
    _corpus_cbr_scan,
    _corpus_vbr_scan,
    corpus_n_valid,
    encode_file_cbr,
)
from sea_codec_tpu.ops.pallas_encode import encode_windows_pallas_fn


def _init_state(c: int, rng, big_weights: bool = False):
    hist0 = np.tile(lms_ops.initial_history(1), (c, 1)).astype(np.int32)
    if big_weights:
        # near the cheap-rank exactness domain edge (|w| < 2^23)
        wts0 = rng.integers(-(1 << 22), 1 << 22, size=(c, 4)).astype(np.int32)
    else:
        wts0 = np.tile(lms_ops.initial_weights(1), (c, 1)).astype(np.int32)
    prev0 = np.zeros(c, np.int32)
    return hist0, wts0, prev0


@pytest.mark.parametrize(
    "c,sff,sfb,nw,mode,ragged",
    [
        (2, 10, 4, 4, "const3", False),
        (2, 5, 4, 4, "mixed", True),
        (3, 5, 3, 4, "mixed", True),
        (1, 10, 5, 2, "mixed", False),
        (2, 10, 4, 4, "bigw", False),
    ],
)
def test_window_kernel_matches_xla(c, sff, sfb, nw, mode, ragged):
    """encode_windows_pallas_fn (interpret) == the XLA window kernel."""
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_encode import encode_windows_fn

    rng = np.random.default_rng(hash((c, sff, sfb, nw, mode)) % 2**31)
    if mode == "const3":
        rs = np.full((nw, c), 3, np.int32)
    else:
        rs = rng.integers(1, 9, size=(nw, c)).astype(np.int32)
    samples = rng.integers(-32768, 32768, size=(nw * sff, c)).astype(np.int32)
    n_valid = np.full(nw, sff, np.int32)
    if ragged:
        n_valid[-1] = sff - 2
    hist0, wts0, prev0 = _init_state(c, rng, big_weights=mode == "bigw")

    got = encode_windows_pallas_fn(
        jnp.asarray(samples), jnp.asarray(rs), jnp.asarray(n_valid),
        jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0),
        scale_factor_frames=sff, scale_factor_bits=sfb, interpret=pallas_interpret(),
    )
    want = encode_windows_fn(
        jnp.asarray(samples), jnp.asarray(rs), jnp.asarray(n_valid),
        jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0),
        jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), jnp.int32),
        jnp.asarray(tables.reciprocals_stacked(sfb), jnp.int32),
        jnp.asarray(tables.quant_tab(), jnp.int32),
        jnp.asarray(tables.quant_offsets(), jnp.int32),
        scale_factor_frames=sff, n_candidates=1 << sfb,
    )
    names = ("sf", "codes", "ranks", "hist", "wts", "prev_sf")
    for nm, a, b in zip(names, got, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{nm} differs (c={c} sff={sff} sfb={sfb} {mode})",
        )


def _corpus_case(nc, fpc, c, n_files, lens, rng):
    b = n_files * c
    samples = rng.integers(-32768, 32768, size=(nc, fpc, b)).astype(np.int16)
    frames = np.zeros(b, np.int32)
    for j, ln in enumerate(lens):
        frames[j * c : (j + 1) * c] = ln
    hist0 = np.tile(lms_ops.initial_history(1), (b, 1)).astype(np.int32)
    wts0 = np.tile(lms_ops.initial_weights(1), (b, 1)).astype(np.int32)
    prev0 = np.zeros(b, np.int32)
    return samples, frames, hist0, wts0, prev0


@pytest.mark.parametrize(
    "fpc,sff,lens",
    [
        # w=8, wb=8, wp=8: the all_valid fast path is live; chunk validity
        # pattern [full, full, ragged] exercises BOTH lax.cond branches
        (40, 5, (120, 100)),
        # one lane all-full, the other ends mid-window in chunk 1
        (40, 5, (120, 63)),
        # w=6 < wb=8 -> padded windows: the fast path must stay OFF
        (30, 5, (90, 47)),
    ],
)
def test_corpus_cbr_cond_paths_match_xla(fpc, sff, lens):
    rng = np.random.default_rng(fpc * 1000 + lens[1])
    c, nf = 2, 2
    nc = max(-(-ln // fpc) for ln in lens)
    samples, frames, hist0, wts0, prev0 = _corpus_case(nc, fpc, c, nf, lens, rng)
    nv = corpus_n_valid(jnp.asarray(frames), nc, fpc, sff, full_only=False)
    args = (jnp.asarray(samples), nv, jnp.asarray(hist0), jnp.asarray(wts0),
            jnp.asarray(prev0))
    kw = dict(scale_factor_frames=sff, scale_factor_bits=4, residual_size=3)
    got = _corpus_cbr_scan(*args, use_pallas=True, interpret=pallas_interpret(), **kw)
    want = _corpus_cbr_scan(*args, use_pallas=False, **kw)
    names = ("sf", "codes", "ehist", "ewts", "hist", "wts", "prev")
    for nm, a, b in zip(names, got, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{nm} differs (fpc={fpc} lens={lens})",
        )


def test_corpus_vbr_cond_paths_match_xla():
    # full_only VBR masking: chunk validity [full, zero] per ragged lane --
    # the cond's fast branch on full chunks, masked branch on the tail chunk
    rng = np.random.default_rng(7)
    fpc, sff, c, nf = 40, 5, 2, 2
    lens = (80, 55)  # file 1: 2 full chunks; file 2: 1 full + ragged (masked)
    nc = 2
    samples, frames, hist0, wts0, prev0 = _corpus_case(nc, fpc, c, nf, lens, rng)
    nv = corpus_n_valid(jnp.asarray(frames), nc, fpc, sff, full_only=True)
    args = (jnp.asarray(samples), nv, jnp.asarray(hist0), jnp.asarray(wts0),
            jnp.asarray(prev0))
    kw = dict(scale_factor_frames=sff, scale_factor_bits=4, base=2,
              dist=(2, 3, 1), n_files=nf)
    got = _corpus_vbr_scan(*args, use_pallas=True, interpret=pallas_interpret(), **kw)
    want = _corpus_vbr_scan(*args, use_pallas=False, **kw)
    names = ("sf", "codes", "sizes", "ehist", "ewts", "hist", "wts", "prev")
    for nm, a, b in zip(names, got, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{nm} differs"
        )


@pytest.mark.parametrize("ragged", [False, True])
def test_ranks_only_variant_matches_full_kernel(ragged):
    # the VBR analyze pass reads only ranks + carried state; the ranks_only
    # kernel elides code stores/selection and must leave those identical
    rng = np.random.default_rng(23)
    c, sff, sfb, nw = 3, 5, 4, 6
    rs = rng.integers(1, 9, size=(nw, c)).astype(np.int32)
    samples = rng.integers(-32768, 32768, size=(nw * sff, c)).astype(np.int32)
    n_valid = np.full(nw, sff, np.int32)
    if ragged:
        n_valid[-1] = sff - 3
    hist0, wts0, prev0 = _init_state(c, rng)
    args = (jnp.asarray(samples), jnp.asarray(rs), jnp.asarray(n_valid),
            jnp.asarray(hist0), jnp.asarray(wts0), jnp.asarray(prev0))
    kw = dict(scale_factor_frames=sff, scale_factor_bits=sfb, interpret=pallas_interpret())
    full = encode_windows_pallas_fn(*args, **kw)
    fast = encode_windows_pallas_fn(*args, ranks_only=True, **kw)
    # codes (index 1) are undefined under ranks_only; everything else exact
    for i, nm in ((0, "sf"), (2, "ranks"), (3, "hist"), (4, "wts"), (5, "prev")):
        np.testing.assert_array_equal(
            np.asarray(full[i]), np.asarray(fast[i]),
            err_msg=f"{nm} differs (ragged={ragged})",
        )


def test_file_cbr_static_all_valid_matches_xla():
    # encode_file_cbr feeds full chunks only -> static all_valid kernel
    rng = np.random.default_rng(11)
    fpc, sff, c, nc = 40, 5, 2, 3
    samples = rng.integers(-32768, 32768, size=(nc, fpc, c)).astype(np.int32)
    hist0, wts0, prev0 = _init_state(c, rng)
    args = (jnp.asarray(samples), jnp.asarray(hist0), jnp.asarray(wts0),
            jnp.asarray(prev0))
    kw = dict(scale_factor_frames=sff, scale_factor_bits=4, residual_size=3)
    got = encode_file_cbr(*args, use_pallas=True, interpret=pallas_interpret(), **kw)
    want = encode_file_cbr(*args, use_pallas=False, **kw)
    names = ("sf", "codes", "ehist", "ewts", "hist", "wts", "prev")
    for nm, a, b in zip(names, got, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{nm} differs"
        )
