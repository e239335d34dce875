"""CBR encoder model (reference ``src/codec/encoder_cbr.rs``).

Constant residual size = floor(residual_bits); each chunk's windows run the
scale-factor search sequentially (LMS and prev_sf carry across windows and
across chunks) with channels and the 2^sfb candidates vectorized on device.
"""

from __future__ import annotations

import numpy as np

from .common import EncodedSamples, EncoderBaseState, EncoderKernel


class CbrEncoderModel:
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
        self.residual_size = int(np.floor(residual_bits))
        self.chunk_residual_size = self.residual_size
        self.frames_per_chunk = frames_per_chunk
        self.windows_per_chunk = -(-frames_per_chunk // scale_factor_frames)
        self.kernel = EncoderKernel(channels, scale_factor_bits, scale_factor_frames)
        self.state = EncoderBaseState(channels)

    @property
    def lms_snapshot(self) -> tuple[np.ndarray, np.ndarray]:
        """Chunk-entry LMS state (reference src/codec/file.rs:146-149)."""
        return self.state.hist.copy(), self.state.wts.copy()

    def encode(self, samples: np.ndarray) -> EncodedSamples:
        """samples: int16[frames * channels] interleaved; one chunk's worth."""
        c = self.channels
        frames = samples.shape[0] // c
        w_real = -(-frames // self.scale_factor_frames)
        rs = np.full((w_real, c), self.residual_size, dtype=np.int32)
        sf, codes, _ranks = self.kernel.run(
            self.state, samples, rs, self.windows_per_chunk
        )
        return EncodedSamples(
            scale_factors=sf.reshape(-1).astype(np.uint8),
            residuals=codes.reshape(-1).astype(np.uint8),
            residual_bits=np.zeros(0, dtype=np.uint8),
        )
