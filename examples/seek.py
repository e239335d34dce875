"""Constant-time seeking: decode an arbitrary frame range in O(range).

Every ``.sea`` chunk carries its own LMS entry state (reference
``README.md:88-121``, ``chunk.rs:95-103``), so decode can start at any
chunk boundary without touching earlier bytes. ``decode_range`` reads only
the chunks overlapping the requested range.

Usage:
    python examples/seek.py [--frames 200000] [--start 123450] [--count 1000]
"""

from __future__ import annotations

import argparse
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

import sea_codec_tpu as sea
from sea_codec_tpu.batch import decode_range
from sea_codec_tpu.utils.signal import gen_test_signal


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=200000)
    p.add_argument("--start", type=int, default=123450)
    p.add_argument("--count", type=int, default=1000)
    args = p.parse_args()

    channels, sample_rate = 2, 44100
    samples = gen_test_signal(channels, args.frames)
    encoded = sea.sea_encode(samples, sample_rate, channels)

    window = decode_range(encoded, args.start, args.count)

    # cross-check against the full decode
    full = sea.sea_decode(encoded).samples
    ref = full[args.start * channels : (args.start + args.count) * channels]
    assert np.array_equal(window, ref), "seek window != full-decode slice"
    print(f"decoded frames [{args.start}, {args.start + args.count}) of "
          f"{args.frames}: {window.size} samples, identical to the "
          f"full-decode slice")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
