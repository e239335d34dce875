"""Streaming sessions: encode and decode concurrently over a byte pipe.

Every chunk is self-contained, so the decoder can consume the stream as it
is produced — the reference proves the same property with its interleaved
encoder/decoder test (``/root/reference/tests/streaming.rs:51-97``); the
session APIs mirror ``src/encoder.rs:50-159`` / ``src/decoder.rs:22-72``.

Streaming mode: passing ``total_frames=None`` records 0 ("unknown") in the
header and the decoder reads until EOF. (Passing an explicit ``0`` instead
writes the header upfront before the first chunk is sized — a
write-side-only mode, reference ``encoder.rs:70-77``.)

Usage:
    python examples/streaming.py [--frames 50000]
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS even when a sitecustomize pre-registers a TPU plugin
# programmatically (which overrides the env var; same forcing as tests/)
import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from sea_codec_tpu import EncoderSettings, SeaDecoder, SeaEncoder, sea_decode, sea_encode
from sea_codec_tpu.utils.signal import gen_test_signal


class Pipe:
    """Writes append; reads drain from the front (streaming.rs:18-49)."""

    def __init__(self):
        self._buf = bytearray()

    def write(self, data: bytes) -> int:
        self._buf += data
        return len(data)

    def read(self, n: int) -> bytes:
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def flush(self):
        pass


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=50000)
    p.add_argument("--fpc", type=int, default=5120)
    args = p.parse_args()

    channels, sample_rate = 2, 44100
    samples = gen_test_signal(channels, args.frames)
    settings = EncoderSettings(residual_bits=3.0, frames_per_chunk=args.fpc)

    pipe = Pipe()
    pcm_out = io.BytesIO()
    source = io.BytesIO(samples.astype("<i2").tobytes())

    enc = SeaEncoder(channels, sample_rate, None, settings, source, pipe)
    chunks = 0
    assert enc.encode_frame()  # header + first chunk are now in the pipe
    dec = SeaDecoder(pipe, pcm_out)
    more = True
    while more:
        more = enc.encode_frame()
        dec.decode_frame()
        chunks += 1
    enc.finalize()
    # drain remaining full chunks; a short final chunk cannot be sized in
    # streaming mode (reference chunk.rs:76-79) and ends the stream
    while True:
        try:
            if not dec.decode_frame():
                break
        except Exception:
            break
    dec.finalize()

    streamed = np.frombuffer(pcm_out.getvalue(), dtype="<i2")
    batch = sea_decode(
        sea_encode(samples, sample_rate, channels, settings)
    ).samples
    n = min(streamed.size, batch.size)
    assert np.array_equal(streamed[:n], batch[:n]), "streamed != batch decode"
    print(f"streamed {chunks} chunks, {streamed.size} samples; "
          f"prefix identical to the batch round trip")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
