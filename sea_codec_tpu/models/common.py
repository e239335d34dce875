"""Shared encoder-model plumbing.

``EncodedSamples`` mirrors the reference's encoder output struct
(``src/codec/common.rs:125-134``). ``EncoderBaseState`` holds the only state
the reference threads across scale-factor windows and chunks: per-channel LMS
and the previous winning scale factor (``encoder_base.rs:180-185``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops import lms as lms_ops
from ..ops import tables
from ..ops.device_encode import encode_windows


@dataclass
class EncodedSamples:
    scale_factors: np.ndarray  # uint8, window-major then channel
    residuals: np.ndarray  # uint8, interleaved like the input samples
    residual_bits: np.ndarray  # uint8 per (window, channel); empty for CBR


@dataclass
class EncoderBaseState:
    channels: int
    hist: np.ndarray = field(init=False)
    wts: np.ndarray = field(init=False)
    prev_sf: np.ndarray = field(init=False)

    def __post_init__(self):
        self.hist = lms_ops.initial_history(self.channels)
        self.wts = lms_ops.initial_weights(self.channels)
        self.prev_sf = np.zeros(self.channels, dtype=np.int32)


class EncoderKernel:
    """Holds the device tables and runs the window-search kernel.

    On TPU backends the search runs as a Pallas kernel
    (``ops.pallas_encode``); elsewhere (CPU tests, interpret) it runs as the
    XLA scan (``ops.device_encode``). Both are bit-identical.
    """

    def __init__(
        self,
        channels: int,
        scale_factor_bits: int,
        scale_factor_frames: int,
        use_pallas: bool | None = None,
    ):
        self.channels = channels
        self.scale_factor_bits = scale_factor_bits
        self.scale_factor_frames = scale_factor_frames
        self.n_candidates = 1 << scale_factor_bits
        if use_pallas is None:
            from ..ops.device_decode import default_use_pallas

            # sfb=8 (256 candidate sublanes) exceeds the kernel's VMEM
            # budget; that API-only config uses the XLA path.
            use_pallas = (
                default_use_pallas() and channels <= 128 and scale_factor_bits <= 7
            )
        self.use_pallas = use_pallas
        self.dqt_flat = jnp.asarray(
            tables.dqt_stacked(scale_factor_bits).reshape(-1), dtype=jnp.int32
        )
        self.recip = jnp.asarray(
            tables.reciprocals_stacked(scale_factor_bits), dtype=jnp.int32
        )
        self.qtab = jnp.asarray(tables.quant_tab(), dtype=jnp.int32)
        self.qt_offsets = jnp.asarray(tables.quant_offsets(), dtype=jnp.int32)

    def run(
        self,
        state: EncoderBaseState,
        samples: np.ndarray,  # int16[frames * channels] interleaved
        rs_per_window: np.ndarray,  # int32[W_real, C]
        n_windows_padded: int,
        update_lms: bool = True,
        update_prev_sf: bool = True,
    ):
        """Search all windows of one chunk; returns (sf, codes, ranks).

        ``n_windows_padded`` fixes the compiled shape (padding windows are
        fully masked and leave all state untouched); outputs are sliced back
        to the real window count. ``update_lms=False`` implements the VBR
        analyze pass, which restores LMS but *keeps* the advanced prev_sf
        (reference ``encoder_vbr.rs:168`` restores only ``lms``).
        """
        c = self.channels
        sff = self.scale_factor_frames
        frames = samples.shape[0] // c
        w_real = -(-frames // sff)
        w_pad = n_windows_padded
        assert w_real <= w_pad

        x = np.zeros((w_pad * sff, c), dtype=np.int32)
        x[:frames] = samples.reshape(frames, c).astype(np.int32)
        rs = np.zeros((w_pad, c), dtype=np.int32)
        rs[:w_real] = rs_per_window
        rs[w_real:] = 1  # any valid size; windows are masked
        n_valid = np.clip(
            frames - np.arange(w_pad, dtype=np.int32) * sff, 0, sff
        ).astype(np.int32)

        if self.use_pallas:
            from ..ops.pallas_encode import encode_windows_pallas

            sf, codes, ranks, hist, wts, prev_sf = encode_windows_pallas(
                jnp.asarray(x),
                jnp.asarray(rs),
                jnp.asarray(n_valid),
                jnp.asarray(state.hist),
                jnp.asarray(state.wts),
                jnp.asarray(state.prev_sf),
                scale_factor_frames=sff,
                scale_factor_bits=self.scale_factor_bits,
            )
        else:
            sf, codes, ranks, hist, wts, prev_sf = encode_windows(
                jnp.asarray(x),
                jnp.asarray(rs),
                jnp.asarray(n_valid),
                jnp.asarray(state.hist),
                jnp.asarray(state.wts),
                jnp.asarray(state.prev_sf),
                self.dqt_flat,
                self.recip,
                self.qtab,
                self.qt_offsets,
                scale_factor_frames=sff,
                n_candidates=self.n_candidates,
            )
        if update_lms:
            state.hist = np.asarray(hist)
            state.wts = np.asarray(wts)
        if update_prev_sf:
            state.prev_sf = np.asarray(prev_sf)

        sf = np.asarray(sf)[:w_real]  # [W_real, C]
        codes = np.asarray(codes)[:frames]  # [frames, C]
        ranks = np.asarray(ranks)[:w_real]  # [W_real, C]
        return sf, codes, ranks

    def run_lanes(self, x, rs, n_valid, hist0, wts0, prev0):
        """Lane-packed window search: many independent streams in one call.

        ``x`` int32[Wp*sff, L], ``rs``/``n_valid`` int32[Wp, L] (per-lane
        window lengths; padding lanes/windows fully masked at 0),
        ``hist0``/``wts0`` int32[L, 4], ``prev0`` int32[L]. Returns
        (sf, codes, ranks, hist, wts, prev) as numpy arrays, unsliced.
        The Pallas kernel supports up to 512 lanes per call."""
        sff = self.scale_factor_frames
        if self.use_pallas:
            from ..ops.pallas_encode import encode_windows_pallas

            out = encode_windows_pallas(
                jnp.asarray(x),
                jnp.asarray(rs),
                jnp.asarray(n_valid),
                jnp.asarray(hist0),
                jnp.asarray(wts0),
                jnp.asarray(prev0),
                scale_factor_frames=sff,
                scale_factor_bits=self.scale_factor_bits,
            )
        else:
            out = encode_windows(
                jnp.asarray(x),
                jnp.asarray(rs),
                jnp.asarray(n_valid),
                jnp.asarray(hist0),
                jnp.asarray(wts0),
                jnp.asarray(prev0),
                self.dqt_flat,
                self.recip,
                self.qtab,
                self.qt_offsets,
                scale_factor_frames=sff,
                n_candidates=self.n_candidates,
            )
        return tuple(np.asarray(o) for o in out)
