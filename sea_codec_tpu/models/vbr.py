"""VBR encoder model (reference ``src/codec/encoder_vbr.rs``).

Two passes per chunk:

1. *analyze*: encode every window at ``base+1`` bits recording per-window
   per-channel error ranks, then restore the LMS state -- but, exactly like
   the reference (``encoder_vbr.rs:168`` restores only ``lms``), keep the
   advanced ``prev_scalefactor``.
2. choose per-(window, channel) residual sizes from the error ranking via the
   interpolated TARGET_RESIDUAL_DISTRIBUTION (``encoder_vbr.rs:20-21,66-137``,
   float32 arithmetic reproduced exactly), then re-encode with those sizes.

Tie-break note: the reference ranks windows with an *unstable* sort
(``encoder_vbr.rs:103``); this implementation uses a stable argsort, so on
exactly-tied error ranks the set of windows promoted/demoted can differ from
the Rust binary while remaining a valid (and deterministic) encoding.
"""

from __future__ import annotations

import numpy as np

from ..ops.tables import LMS_LEN
from .common import EncodedSamples, EncoderBaseState, EncoderKernel

# ([0, target-1, target, target+1, target+2, 0]) -- reference encoder_vbr.rs:21
TARGET_RESIDUAL_DISTRIBUTION = (0.00, 0.00, 0.95, 0.05, 0.00, 0.00)


def normalized_vbr_bitrate(
    residual_bits: float,
    frames_per_chunk: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
) -> np.float32:
    """Compensate the target bitrate for container overhead, f32-exact.

    Reference ``encoder_vbr.rs:40-63``.
    """
    f32 = np.float32
    d = [f32(x) for x in TARGET_RESIDUAL_DISTRIBUTION]
    vbr = f32(residual_bits)
    # compensate lms
    vbr = f32(vbr - f32(f32(f32(LMS_LEN) * f32(16.0) * f32(2.0)) / f32(frames_per_chunk)))
    # compensate scale factor data
    vbr = f32(vbr - f32(f32(scale_factor_bits) / f32(scale_factor_frames)))
    # compensate vbr data
    vbr = f32(vbr - f32(f32(2.0) / f32(scale_factor_frames)))
    # compensate with target distribution
    base = f32(np.floor(f32(residual_bits)))
    new_bitrate = f32(
        f32(f32(d[1] * f32(base - f32(1.0))) + f32(d[2] * base))
        + f32(f32(d[3] * f32(base + f32(1.0))) + f32(d[4] * f32(base + f32(2.0))))
    )
    diff = f32(new_bitrate - base)
    return f32(vbr - diff)


def interpolate_distribution(items: int, target_rate: np.float32) -> tuple[int, int, int, int]:
    """Item counts for sizes [target-1, target, target+1, target+2].

    Exact f32 replication of reference ``encoder_vbr.rs:66-96`` including the
    truncating casts and the leftover dump into the target bucket.
    """
    f32 = np.float32
    d = [f32(x) for x in TARGET_RESIDUAL_DISTRIBUTION]
    frac = f32(target_rate - np.trunc(target_rate))
    om_frac = f32(f32(1.0) - frac)
    pct = [f32(f32(d[i] * frac) + f32(d[i + 1] * om_frac)) for i in range(4)]

    res = [0, 0, 0, 0]
    total = 0
    while total < items:
        remaining = items - total
        for i in range(4):
            value = int(f32(f32(remaining) * pct[i]))  # f32 mult, trunc
            total += value
            res[i] += value
        if items - total == remaining:
            total += remaining
            res[1] += remaining
    return res[0], res[1], res[2], res[3]


def vbr_base(target: np.float32) -> int:
    """trunc-to-u8 with saturation, matching Rust `f32 as u8`
    (``encoder_vbr.rs:108,140``): tiny-chunk/high-overhead configs can push
    the normalized target negative; Rust saturates to 0."""
    return int(np.clip(np.trunc(np.float32(target)), 0, 255))


class VbrEncoderModel:
    def __init__(
        self,
        channels: int,
        scale_factor_bits: int,
        scale_factor_frames: int,
        residual_bits: float,
        frames_per_chunk: int,
    ):
        self.channels = channels
        self.scale_factor_frames = scale_factor_frames
        self.frames_per_chunk = frames_per_chunk
        self.windows_per_chunk = -(-frames_per_chunk // scale_factor_frames)
        self.vbr_target_bitrate = normalized_vbr_bitrate(
            residual_bits, frames_per_chunk, scale_factor_bits, scale_factor_frames
        )
        # The chunk header's residual_size field anchors the 2-bit size
        # deltas (stored as size - field + 1, range 0..3). The reference
        # always writes floor(residual_bits) (chunk.rs:60), which produces
        # *corrupt* streams when overhead compensation pulls the size base
        # more than 1 below it (negative deltas, silently wrapped). We anchor
        # at min(floor(residual_bits), base + 1): byte-identical wherever the
        # reference is correct, valid everywhere.
        base = vbr_base(self.vbr_target_bitrate)
        self.chunk_residual_size = min(int(np.floor(residual_bits)), base + 1)
        self.kernel = EncoderKernel(channels, scale_factor_bits, scale_factor_frames)
        self.state = EncoderBaseState(channels)

    @property
    def lms_snapshot(self) -> tuple[np.ndarray, np.ndarray]:
        return self.state.hist.copy(), self.state.wts.copy()

    def _choose_residual_sizes(self, input_len: int, errors: np.ndarray) -> np.ndarray:
        """reference ``encoder_vbr.rs:98-137``; errors is uint64[W*C]."""
        sff = self.scale_factor_frames
        # last partial windows must keep the base size (encoder_vbr.rs:100)
        sortable = input_len // sff
        indices = np.argsort(errors[:sortable], kind="stable")
        m1, _, p1, p2 = interpolate_distribution(sortable, self.vbr_target_bitrate)
        base = vbr_base(self.vbr_target_bitrate)  # trunc-saturating, reference :108
        sizes = np.full(errors.shape[0], base, dtype=np.int32)
        if m1:
            sizes[indices[:m1]] = base - 1
        if p1:
            sizes[indices[sortable - p2 - p1 : sortable - p2]] = base + 1
        if p2:
            sizes[indices[sortable - p2 :]] = base + 2
        # Residual sizes are clamped to 1..8. The reference panics when the
        # distribution assigns base+2 = 9 (VBR at target 8.0) or base = 0
        # (tiny chunks where overhead compensation exceeds the target); such
        # sizes are not representable in the format. Clamping is a deliberate
        # divergence that keeps every settings combination usable.
        return np.clip(sizes, 1, 8).astype(np.uint8)

    def encode(self, samples: np.ndarray) -> EncodedSamples:
        c = self.channels
        frames = samples.shape[0] // c
        w_real = -(-frames // self.scale_factor_frames)
        base = vbr_base(self.vbr_target_bitrate)

        # Pass 1: analyze at base+1 bits; restore LMS, keep prev_sf.
        rs1 = np.full((w_real, c), base + 1, dtype=np.int32)
        _sf, _codes, ranks = self.kernel.run(
            self.state, samples, rs1, self.windows_per_chunk, update_lms=False
        )
        errors = ranks.reshape(-1)  # [W_real * C] window-major, channel-minor
        sizes = self._choose_residual_sizes(samples.shape[0], errors)

        # Pass 2: encode with the assigned sizes.
        rs2 = sizes.reshape(w_real, c).astype(np.int32)
        sf, codes, _ranks = self.kernel.run(
            self.state, samples, rs2, self.windows_per_chunk
        )
        return EncodedSamples(
            scale_factors=sf.reshape(-1).astype(np.uint8),
            residuals=codes.reshape(-1).astype(np.uint8),
            residual_bits=sizes,
        )
