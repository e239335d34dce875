"""One-shot convenience API (reference ``src/lib.rs:13-63``)."""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np


@dataclass
class SeaDecodeInfo:
    samples: np.ndarray  # int16, interleaved
    sample_rate: int
    channels: int


def sea_encode(
    input_samples,
    sample_rate: int,
    channels: int,
    settings: "EncoderSettings | None" = None,
) -> bytes:
    """Encode interleaved i16 samples to ``.sea`` bytes."""
    from .encoder import EncoderSettings, SeaEncoder

    if settings is None:
        settings = EncoderSettings()
    samples = np.asarray(input_samples, dtype=np.int16)
    reader = io.BytesIO(samples.astype("<i2").tobytes())
    writer = io.BytesIO()
    enc = SeaEncoder(
        channels, sample_rate, samples.shape[0] // channels, settings, reader, writer
    )
    while enc.encode_frame():
        pass
    enc.finalize()
    return writer.getvalue()


def sea_decode(encoded: bytes) -> SeaDecodeInfo:
    """Decode ``.sea`` bytes to interleaved i16 samples."""
    from .decoder import SeaDecoder

    reader = io.BytesIO(encoded)
    writer = io.BytesIO()
    dec = SeaDecoder(reader, writer)
    while dec.decode_frame():
        pass
    dec.finalize()
    header = dec.get_header()
    samples = np.frombuffer(writer.getvalue(), dtype="<i2")
    return SeaDecodeInfo(
        samples=samples, sample_rate=header.sample_rate, channels=header.channels
    )
