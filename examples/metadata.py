"""Metadata: store and read UTF-8 key=value pairs in the .sea header.

The format reserves ``metadata_size`` + bytes in the header (reference
``README.md:71-84``, ``file.rs:40-93``). Note the compatibility quirk
documented in ``container.py``: the reference's *parser* never consumes
the metadata bytes (``file.rs:53-55``), so reference-produced files always
carry empty metadata; this implementation follows the written spec and
round-trips it.

Usage:
    python examples/metadata.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS even when a sitecustomize pre-registers a TPU plugin
# programmatically (which overrides the env var; same forcing as tests/)
import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import io

import sea_codec_tpu as sea
from sea_codec_tpu.container import SeaFileHeader
from sea_codec_tpu.utils.signal import gen_test_signal


def main() -> int:
    channels, sample_rate = 2, 44100
    samples = gen_test_signal(channels, 8000)

    # the structured helpers enforce the spec's key rules (README.md:73-77)
    meta = sea.format_metadata({"title": "Example", "artist": "sea-codec-tpu"})
    settings = sea.EncoderSettings(metadata=meta)
    encoded = sea.sea_encode(samples, sample_rate, channels, settings)

    header = SeaFileHeader.from_reader(io.BytesIO(encoded))
    assert header.metadata == meta
    pairs = sea.parse_metadata(header.metadata)
    assert sea.lookup_metadata(pairs, "ARTIST") == "sea-codec-tpu"  # keys fold
    print(f"header metadata ({len(meta)} bytes): {pairs}")

    decoded = sea.sea_decode(encoded)
    assert decoded.samples.size == samples.size
    print(f"decode still sample-exact alongside metadata: "
          f"{decoded.samples.size} samples")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
