"""Multi-host corpus encode: a real 2-process JAX cluster on one machine.

The reference is single-process (SURVEY.md §2 "parallelism — explicit
statement"); multi-host scale is this framework's TPU-native extension.
The distributed design is pure data parallelism derived from the format:
files shard across hosts (DCN), each host's shard encodes over a mesh of
its local devices (ICI), and no collective ever touches the compute path —
so multi-host output is byte-identical to single-process output.

This example demonstrates the launch pattern end-to-end by spawning TWO
worker processes of itself (4 virtual CPU devices each = 8 global), the
same shape as `python -m sea_codec_tpu.batch_cli IN OUT --distributed
--coordinator HOST:PORT --num-processes N --process-id I` on a real
cluster. Each worker:

1. initializes the cluster through ``parallel.distributed.initialize``,
2. proves it with a cross-process ``psum`` over all 8 devices,
3. takes its file shard via ``shard_files_across_hosts`` and encodes it
   with ``encode_corpus(..., mesh=<local-device mesh>)``.

The parent then checks every file's bytes against a single-process encode.

Usage:
    python examples/distributed.py [--files 6] [--frames 500] [--fpc 200]
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS even when a sitecustomize pre-registers a TPU plugin
# programmatically (which overrides the env var; same forcing as tests/)
if os.environ.get("JAX_PLATFORMS") and "--process-id" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def make_files(n_files: int, frames: int, channels: int):
    from sea_codec_tpu.utils.signal import varied_signal

    return [
        varied_signal(channels, frames + 17 * i, seed=700 + i)
        for i in range(n_files)
    ]


def worker(args) -> int:
    # each worker is one "host": its own process, its own local devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import encode_corpus
    from sea_codec_tpu.parallel.distributed import (
        initialize,
        shard_files_across_hosts,
    )

    initialize(args.coordinator, num_processes=2, process_id=args.process_id)
    me = jax.process_index()
    print(
        f"worker {me}: {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )

    # cluster proof: one collective spanning both processes' devices
    gmesh = Mesh(np.array(jax.devices()).reshape(-1), ("d",))
    nd = jax.device_count()
    local = np.arange(nd, dtype=np.float32)[me * 4 : (me + 1) * 4]
    x = jax.make_array_from_process_local_data(
        NamedSharding(gmesh, P("d")), local, global_shape=(nd,)
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(gmesh, P()))(x)
    assert float(total) == nd * (nd - 1) / 2, float(total)
    print(f"worker {me}: cross-process psum ok ({float(total):.0f})")

    files = make_files(args.files, args.frames, 2)
    mine = shard_files_across_hosts(len(files))
    local_mesh = Mesh(np.array(jax.local_devices()).reshape(-1), ("files",))
    st = EncoderSettings(frames_per_chunk=args.fpc, scale_factor_frames=10)
    t0 = time.perf_counter()
    encoded = encode_corpus([files[i] for i in mine], 44100, 2, st, mesh=local_mesh)
    dt = time.perf_counter() - t0
    outdir = Path(args.outdir)
    for i, blob in zip(mine, encoded):
        (outdir / f"file_{i}.sea").write_bytes(blob)
    print(f"worker {me}: encoded files {list(mine)} in {dt:.2f}s")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--files", type=int, default=6)
    p.add_argument("--frames", type=int, default=500)
    p.add_argument("--fpc", type=int, default=200)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--outdir", default=None)
    args = p.parse_args()
    if args.process_id is not None:
        return worker(args)

    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    with tempfile.TemporaryDirectory() as outdir:
        procs = [
            subprocess.Popen(
                [
                    sys.executable, __file__,
                    "--files", str(args.files),
                    "--frames", str(args.frames),
                    "--fpc", str(args.fpc),
                    "--process-id", str(pid),
                    "--coordinator", f"localhost:{port}",
                    "--outdir", outdir,
                ],
                env={**os.environ, "PYTHONPATH": ""},
            )
            for pid in range(2)
        ]
        rcs = [q.wait(timeout=540) for q in procs]
        assert rcs == [0, 0], f"worker exit codes {rcs}"

        # byte-identity against a single-process encode of the same corpus
        from sea_codec_tpu import EncoderSettings
        from sea_codec_tpu.batch import encode_corpus

        files = make_files(args.files, args.frames, 2)
        st = EncoderSettings(frames_per_chunk=args.fpc, scale_factor_frames=10)
        want = encode_corpus(files, 44100, 2, st)
        for i in range(args.files):
            got = (Path(outdir) / f"file_{i}.sea").read_bytes()
            assert got == want[i], f"file {i}: multi-host bytes diverge"
    print(f"multi-host == single-process: {args.files} files byte-identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
