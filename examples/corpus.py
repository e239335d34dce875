"""Corpus transcoding: many files encoded/decoded in batched device calls.

The reference is strictly one-file-at-a-time; batch scale is this
framework's TPU-native extension (derived from the format's structure:
chunks are self-contained, so decode is embarrassingly parallel across
chunks x files, SURVEY.md section 2). ``encode_corpus`` packs the channel
streams of many files into the encoder kernel's 128 lanes;
``decode_corpus`` batch-parses and decodes all full chunks in rectangular
device calls. Outputs are byte-identical to the per-file APIs.

Pass ``--mesh`` to shard the lane blocks over every available device
(``jax.sharding.Mesh`` + shard_map; on CPU export
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to get a virtual
8-device mesh). The CLI front end for this flow is
``python -m sea_codec_tpu.batch_cli`` (``--distributed`` adds
``jax.distributed`` multi-host init).

Usage:
    python examples/corpus.py [--files 16] [--frames 30000] [--mesh] [--vbr]

On CPU the first call compiles a large scan program (~minutes at the
default chunk size); pass ``--fpc 1000 --frames 4000`` for a quick run.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS even when a sitecustomize pre-registers a TPU plugin
# programmatically (which overrides the env var; same forcing as tests/)
import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.batch import decode_corpus, encode_corpus
from sea_codec_tpu.utils.signal import varied_signal


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--files", type=int, default=16)
    p.add_argument("--frames", type=int, default=30000)
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--vbr", action="store_true")
    p.add_argument("--fpc", type=int, default=5120, help="frames per chunk")
    args = p.parse_args()

    channels, sample_rate = 2, 44100
    rng = np.random.default_rng(7)
    files = [
        varied_signal(channels, args.frames + int(rng.integers(0, 997)), seed=i)
        for i in range(args.files)
    ]
    settings = EncoderSettings(
        residual_bits=2.5 if args.vbr else 3.0, vbr=args.vbr,
        frames_per_chunk=args.fpc,
    )

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("d",))
        print(f"mesh over {len(jax.devices())} devices")

    n_samples = sum(f.size for f in files)
    t0 = time.perf_counter()
    blobs = encode_corpus(files, sample_rate, channels, settings, mesh=mesh)
    t_enc = time.perf_counter() - t0

    # byte-identity with the one-file-at-a-time API (spot check)
    assert blobs[0] == sea_encode(files[0], sample_rate, channels, settings)

    t0 = time.perf_counter()
    infos = decode_corpus(blobs, mesh=mesh)
    t_dec = time.perf_counter() - t0
    for f, info in zip(files, infos):
        assert info.samples.size == f.size
    # sample-identity with the one-file-at-a-time API (spot check)
    assert np.array_equal(infos[0].samples, sea_decode(blobs[0]).samples)

    total_bytes = sum(len(b) for b in blobs)
    print(f"{args.files} files, {n_samples / 1e6:.1f} Msamples")
    print(f"encode: {t_enc:.2f}s ({n_samples / t_enc / 1e6:.1f} Msps)  "
          f"decode: {t_dec:.2f}s ({n_samples / t_dec / 1e6:.1f} Msps)")
    print(f"compression: {n_samples * 2 / total_bytes:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
