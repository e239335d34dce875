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

    def decode_chunk(self, chunk: SeaChunk, frames_padded: int | None = None) -> np.ndarray:
        """Decode one chunk -> int16[frames * channels] interleaved.

        ``frames_padded`` fixes the compiled shape (mirroring the encoder
        model's ``n_windows_padded``): a ragged tail chunk decodes through
        the same program as any other tail of its stream instead of
        compiling one program per distinct tail length -- a varied-length
        corpus would otherwise trigger hundreds of device compiles. Padding
        windows decode garbage that is sliced away (the recurrence runs
        forward, so the real frames are unaffected)."""
        if chunk.scale_factor_bits != self.scale_factor_bits:
            raise SeaInvalidFrame(
                "chunk scale_factor_bits "
                f"{chunk.scale_factor_bits} != stream {self.scale_factor_bits}"
            )
        c = self.channels
        f = chunk.frames_in_chunk
        sff = chunk.scale_factor_frames
        w = -(-f // sff)
        fp = max(frames_padded or f, f)
        wp = -(-fp // sff)
        codes = np.zeros((1, fp, c), np.uint8)
        codes[0, :f] = chunk.residuals.reshape(f, c)
        sf = np.zeros((1, wp, c), np.uint8)
        sf[0, :w] = chunk.scale_factors.reshape(w, c)
        rs = np.ones((1, wp, c), np.uint8)
        if chunk.chunk_type == CHUNK_TYPE_VBR:
            rs[0, :w] = chunk.vbr_residual_sizes.reshape(w, c)
        else:
            rs[:] = chunk.residual_size
        out = decode_chunks(
            jnp.asarray(codes),
            jnp.asarray(sf),
            jnp.asarray(rs),
            jnp.asarray(chunk.lms_history.reshape(1, c, 4)),
            jnp.asarray(chunk.lms_weights.reshape(1, c, 4)),
            self.dqt_flat,
            scale_factor_frames=sff,
        )
        return np.asarray(out).reshape(fp * c)[: f * c]
