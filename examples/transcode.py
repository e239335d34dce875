"""One-shot transcode: WAV -> .sea -> WAV, with quality metrics.

Library-level analog of the reference CLI example (seaconv,
``/root/reference/examples/seaconv.rs:151-225``): the installed CLI
(``python -m sea_codec_tpu in.wav out.sea -b 3``) wraps exactly this flow.

Usage:
    python examples/transcode.py [input.wav] [--bitrate 3] [--vbr]

Without an input file, a synthetic multi-tone test signal is generated
(the reference's test strategy, ``tests/helpers.rs:79-93``).
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
from sea_codec_tpu.utils.signal import audio_quality, gen_test_signal
from sea_codec_tpu.utils.wav import read_wav, write_wav


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", help="input WAV (default: synthetic signal)")
    p.add_argument("--bitrate", "-b", type=float, default=3.0)
    p.add_argument("--vbr", action="store_true")
    p.add_argument("--out", default="/tmp/transcode_out.wav")
    p.add_argument("--frames", type=int, default=44100, help="synthetic length")
    p.add_argument("--fpc", type=int, default=5120, help="frames per chunk")
    args = p.parse_args()

    if args.input:
        wave = read_wav(args.input)
        samples, sample_rate, channels = wave.samples, wave.sample_rate, wave.channels
    else:
        sample_rate, channels = 44100, 2
        samples = gen_test_signal(channels, args.frames)

    settings = sea.EncoderSettings(
        residual_bits=args.bitrate, vbr=args.vbr, frames_per_chunk=args.fpc
    )
    encoded = sea.sea_encode(samples, sample_rate, channels, settings)
    decoded = sea.sea_decode(encoded)

    raw_bytes = samples.size * 2
    rms, psnr = audio_quality(samples, decoded.samples)
    print(f"input:   {samples.size} samples ({channels} ch @ {sample_rate} Hz)")
    print(f"encoded: {len(encoded)} bytes ({raw_bytes / len(encoded):.2f}x compression)")
    print(f"quality: rms {rms * 100:.3f}%  psnr {psnr:.1f} dB (lower is better)")

    write_wav(decoded.samples, decoded.channels, decoded.sample_rate, args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
