"""One-shot convenience API (reference ``src/lib.rs:13-63``).

By default these delegate to the fast batch paths (whole-file single-program
encode, chunk-parallel decode); ``engine="session"`` routes through the
streaming sessions instead (chunk-at-a-time, mirroring the reference's
control flow). Both engines produce byte-identical output (tested).
"""

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
    engine: str = "auto",
) -> bytes:
    """Encode interleaved i16 samples to ``.sea`` bytes."""
    from .encoder import EncoderSettings, SeaEncoder, coerce_samples

    if settings is None:
        settings = EncoderSettings()
    samples = coerce_samples(input_samples)
    if engine in ("auto", "batch"):
        from .batch import encode_sea

        return encode_sea(samples, sample_rate, channels, settings)
    if engine != "session":
        raise ValueError(f"engine must be 'auto', 'batch', or 'session', got {engine!r}")
    reader = io.BytesIO(samples.astype("<i2").tobytes())
    writer = io.BytesIO()
    enc = SeaEncoder(
        channels, sample_rate, samples.shape[0] // channels, settings, reader, writer
    )
    while enc.encode_frame():
        pass
    enc.finalize()
    return writer.getvalue()


def sea_decode(encoded: bytes, engine: str = "auto") -> SeaDecodeInfo:
    """Decode ``.sea`` bytes to interleaved i16 samples."""
    if engine in ("auto", "batch"):
        from .batch import decode_sea

        return decode_sea(encoded)
    if engine != "session":
        raise ValueError(f"engine must be 'auto', 'batch', or 'session', got {engine!r}")
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
