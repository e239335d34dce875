"""Corpus batch transcoder: many WAV -> .sea (or .sea -> WAV) in one run.

    python -m sea_codec_tpu.batch_cli 'audio/*.wav' out/ -b 3 [-v] [flags]
    python -m sea_codec_tpu.batch_cli 'encoded/*.sea' out/

Files are encoded through the lane-packed corpus kernel (channels of many
files encode in parallel) and decoded through the software-pipelined
chunk-parallel batch decoder. Per-file failures are reported and skipped.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

from .cli import build_parser, get_encoder_settings


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    parser.prog = "sea-batch"
    parser.usage = "%(prog)s INPUT_GLOB OUTPUT_DIR [options]"
    parser.add_argument(
        "--mesh",
        action="store_true",
        help="shard the corpus over all local devices (jax.sharding.Mesh)",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host run: initialize jax.distributed from the cluster "
        "environment, shard files across hosts, mesh over local devices",
    )
    parser.add_argument(
        "--coordinator",
        default=None,
        metavar="HOST:PORT",
        help="with --distributed: explicit coordinator address for clusters "
        "jax cannot auto-detect (requires --num-processes and --process-id)",
    )
    parser.add_argument("--num-processes", type=int, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--process-id", type=int, default=None, help=argparse.SUPPRESS)
    args = parser.parse_args(argv)
    settings = get_encoder_settings(args)

    paths = sorted(glob.glob(args.input))
    if not paths:
        print(f"Error: no files match {args.input!r}", file=sys.stderr)
        return 1

    mesh = None
    if args.distributed or args.mesh:
        import jax

        if args.distributed:
            from .parallel.distributed import initialize, shard_files_across_hosts

            initialize(args.coordinator, args.num_processes, args.process_id)
            mine = shard_files_across_hosts(len(paths))
            paths = [paths[i] for i in mine]
            devices = jax.local_devices()
        else:
            devices = jax.devices()
        if len(devices) > 1:
            from .parallel.pipeline import make_mesh

            mesh = make_mesh(len(devices), devices=devices)
    outdir = args.output
    os.makedirs(outdir, exist_ok=True)

    from .batch import _pt

    exts = {os.path.splitext(p)[1].lower() for p in paths}
    if exts == {".wav"}:
        from .batch import encode_corpus
        from .utils.wav import read_wav

        waves, names = [], []
        by_config: dict[tuple[int, int], list[int]] = {}
        with _pt("wav_read"):
            for p in paths:
                try:
                    w = read_wav(p)
                except (OSError, ValueError) as e:
                    print(f"skip {p}: {e}", file=sys.stderr)
                    continue
                by_config.setdefault((w.channels, w.sample_rate), []).append(len(waves))
                waves.append(w)
                names.append(os.path.splitext(os.path.basename(p))[0])
        t0 = time.perf_counter()
        total = 0
        for (channels, rate), idxs in by_config.items():
            with _pt("encode_wall"):
                encoded = encode_corpus(
                    [waves[i].samples for i in idxs], rate, channels, settings,
                    mesh=mesh,
                )
            with _pt("sea_write"):
                for i, enc in zip(idxs, encoded):
                    with open(os.path.join(outdir, names[i] + ".sea"), "wb") as f:
                        f.write(enc)
                    total += waves[i].samples.shape[0]
        dt = time.perf_counter() - t0
        print(
            f"encoded {len(waves)} files / {total} samples in {dt:.2f}s "
            f"({total / max(dt, 1e-9) / 1e6:.1f} Msamples/s)"
        )
    elif exts == {".sea"}:
        from .batch import decode_corpus
        from .utils.wav import write_wav

        with _pt("sea_read"):
            blobs = [open(p, "rb").read() for p in paths]
        t0 = time.perf_counter()
        with _pt("decode_wall"):
            results = decode_corpus(blobs, on_error="skip", mesh=mesh)
        dt = time.perf_counter() - t0
        total = 0
        with _pt("wav_write"):
            for p, info in zip(paths, results):
                if info is None:
                    print(f"skip {p}: undecodable", file=sys.stderr)
                    continue
                name = os.path.splitext(os.path.basename(p))[0] + ".wav"
                write_wav(np.asarray(info.samples), info.channels, info.sample_rate,
                          os.path.join(outdir, name))
                total += info.samples.shape[0]
        print(
            f"decoded {sum(r is not None for r in results)} files / {total} samples "
            f"in {dt:.2f}s ({total / max(dt, 1e-9) / 1e6:.1f} Msamples/s)"
        )
    else:
        print("Error: input glob must match all .wav or all .sea files", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
