"""Worker process for the real multi-host test (tests/test_multihost.py).

Each worker is one "host" of a 2-process JAX cluster (gloo CPU collectives):
it initializes ``jax.distributed`` through the library's own wrapper, takes
its file shard via ``shard_files_across_hosts`` (files-across-hosts over DCN,
the documented distributed design — SURVEY.md §5), encodes that shard over a
mesh of its LOCAL devices (chunks-across-ICI analog), and writes the bytes
for the parent test to assemble and compare against single-process output.

A global-mesh ``psum`` over all 8 devices (spanning both processes) runs
first as proof the cluster is real, not two isolated processes.

Usage: python tests/multihost_worker.py <process_id> <coordinator_port> <outdir>
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    outdir = Path(sys.argv[3])

    from sea_codec_tpu.parallel.distributed import (
        initialize,
        shard_files_across_hosts,
    )

    initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    # cluster proof: a psum across ALL devices of both processes
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    gmesh = Mesh(np.array(jax.devices()).reshape(8), ("d",))
    local = np.arange(8, dtype=np.float32)[pid * 4 : (pid + 1) * 4]
    x = jax.make_array_from_process_local_data(
        NamedSharding(gmesh, P("d")), local, global_shape=(8,)
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(gmesh, P())
    )(x)
    np.testing.assert_allclose(np.asarray(total), 28.0)

    # the codec's distributed shape: this host's file shard, local mesh
    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import decode_corpus, encode_corpus
    from sea_codec_tpu.utils.signal import varied_signal

    n_files, channels = 6, 2
    files = [
        varied_signal(channels, 3 * 100 + 17 * i, seed=100 + i)
        for i in range(n_files)
    ]
    mine = shard_files_across_hosts(n_files)
    local_mesh = Mesh(np.array(jax.local_devices()).reshape(4), ("files",))
    st = EncoderSettings(frames_per_chunk=100, scale_factor_frames=10)
    encoded = encode_corpus(
        [files[i] for i in mine], 44100, channels, st, mesh=local_mesh
    )
    for i, blob in zip(mine, encoded):
        (outdir / f"file_{i}.sea").write_bytes(blob)

    # decode leg: this host's shard back to PCM over the same local mesh
    decoded = decode_corpus(encoded, mesh=local_mesh)
    for i, d in zip(mine, decoded):
        np.save(outdir / f"file_{i}.pcm.npy", np.asarray(d.samples))

    # VBR leg: byte-identity is asserted by the parent against the
    # single-process VBR encoder
    stv = EncoderSettings(
        frames_per_chunk=100, scale_factor_frames=10,
        residual_bits=2.5, vbr=True,
    )
    encoded_v = encode_corpus(
        [files[i] for i in mine], 44100, channels, stv, mesh=local_mesh
    )
    for i, blob in zip(mine, encoded_v):
        (outdir / f"file_{i}.vbr.sea").write_bytes(blob)

    (outdir / f"done_{pid}").write_text("ok")
    print(f"worker {pid}: encoded+decoded files {list(mine)}", flush=True)


if __name__ == "__main__":
    main()
