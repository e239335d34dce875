"""Streaming decoder session (reference ``src/decoder.rs``).

Reads ``.sea`` from a file-like reader, writes interleaved i16 LE PCM to a
file-like writer, one chunk per ``decode_frame`` call. When the header's
``total_frames`` is zero the stream is decoded until EOF (streaming mode).
"""

from __future__ import annotations

from .container import SeaChunk, SeaFileHeader
from .models import DecoderModel
from .utils.io import read_max_or_zero


class SeaDecoder:
    def __init__(self, reader, writer):
        self.reader = reader
        self.writer = writer
        self.header = SeaFileHeader.from_reader(reader)
        self.frames_read = 0
        self._model: DecoderModel | None = None

    def decode_frame(self) -> bool:
        """Decode one chunk; returns False when the stream is exhausted."""
        if self.header.total_frames != 0 and self.header.total_frames <= self.frames_read:
            return False

        remaining = (
            self.header.total_frames - self.frames_read
            if self.header.total_frames > 0
            else None
        )
        encoded = read_max_or_zero(self.reader, self.header.chunk_size)
        if not encoded:
            return False

        chunk = SeaChunk.from_bytes(encoded, self.header, remaining)
        if self._model is None:
            # Lazily sized from the first chunk (reference file.rs:194-199).
            self._model = DecoderModel(self.header.channels, chunk.scale_factor_bits)
        samples = self._model.decode_chunk(
            chunk, frames_padded=self.header.frames_per_chunk
        )
        self.frames_read += samples.shape[0] // self.header.channels
        self.writer.write(samples.astype("<i2").tobytes())
        return True

    def flush(self) -> None:
        try:
            self.writer.flush()
        except (AttributeError, OSError):
            pass

    def finalize(self) -> None:
        self.flush()

    def get_header(self) -> SeaFileHeader:
        return self.header
