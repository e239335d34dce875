"""Chunk decoder model (reference ``src/codec/decoder.rs``).

Stateless across chunks (each chunk carries its own LMS entry state); the
only persistent piece is the dequantization table for the stream's
scale_factor_bits, mirroring the reference Decoder.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..container import CHUNK_TYPE_VBR, SeaChunk
from ..ops import tables
from ..ops.device_decode import decode_chunks
from ..utils.errors import SeaInvalidFrame


class DecoderModel:
    def __init__(self, channels: int, scale_factor_bits: int):
        self.channels = channels
        self.scale_factor_bits = scale_factor_bits
        self.dqt_flat = jnp.asarray(
            tables.dqt_stacked(scale_factor_bits).reshape(-1), dtype=jnp.int32
        )

    def decode_chunk(self, chunk: SeaChunk) -> np.ndarray:
        """Decode one chunk -> int16[frames * channels] interleaved."""
        if chunk.scale_factor_bits != self.scale_factor_bits:
            raise SeaInvalidFrame(
                "chunk scale_factor_bits "
                f"{chunk.scale_factor_bits} != stream {self.scale_factor_bits}"
            )
        c = self.channels
        f = chunk.frames_in_chunk
        w = -(-f // chunk.scale_factor_frames)
        codes = chunk.residuals.reshape(1, f, c)
        sf = chunk.scale_factors.reshape(1, w, c)
        if chunk.chunk_type == CHUNK_TYPE_VBR:
            rs = chunk.vbr_residual_sizes.reshape(1, w, c)
        else:
            rs = np.full((1, w, c), chunk.residual_size, dtype=np.uint8)
        out = decode_chunks(
            jnp.asarray(codes),
            jnp.asarray(sf),
            jnp.asarray(rs),
            jnp.asarray(chunk.lms_history.reshape(1, c, 4)),
            jnp.asarray(chunk.lms_weights.reshape(1, c, 4)),
            self.dqt_flat,
            scale_factor_frames=chunk.scale_factor_frames,
        )
        return np.asarray(out).reshape(f * c)
