"""REAL multi-host execution: a 2-process JAX cluster (gloo CPU collectives).

Round-2 review recorded multi-host as "wiring exists but nothing can exercise
it here". It can: ``jax.distributed.initialize`` + gloo collectives work for
multi-process CPU in this image, so this test spawns two worker processes
(4 virtual devices each = 8 global), runs a cross-process collective, shards
a 6-file corpus across the two "hosts" exactly as the documented design
(files over DCN via ``shard_files_across_hosts``, each host's shard encoded
over a mesh of its local devices — SURVEY.md §5 distributed backend), and
asserts the assembled bytes are identical to a single-process encode.

The workers run the library's own ``parallel.distributed.initialize``
wrapper, so the test covers the production entry point, not a test shim.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_corpus_encode_byte_identity(tmp_path):
    port = _free_port()
    workers = []
    logs = []
    for pid in range(2):
        log = open(tmp_path / f"worker_{pid}.log", "wb")
        logs.append(log)
        workers.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(REPO / "tests" / "multihost_worker.py"),
                    str(pid),
                    str(port),
                    str(tmp_path),
                ],
                stdout=log,
                stderr=subprocess.STDOUT,
                cwd=str(REPO),
            )
        )
    rcs = [w.wait(timeout=540) for w in workers]
    for log in logs:
        log.close()
    if any(rcs):
        for pid in range(2):
            print(f"--- worker {pid} log ---")
            print((tmp_path / f"worker_{pid}.log").read_text()[-4000:])
        pytest.fail(f"worker exit codes: {rcs}")

    # single-process oracle over the identical corpus
    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import encode_corpus
    from sea_codec_tpu.utils.signal import varied_signal

    n_files, channels = 6, 2
    files = [
        varied_signal(channels, 3 * 100 + 17 * i, seed=100 + i)
        for i in range(n_files)
    ]
    st = EncoderSettings(frames_per_chunk=100, scale_factor_frames=10)
    want = encode_corpus(files, 44100, channels, st)

    from sea_codec_tpu import sea_decode

    for i in range(n_files):
        got = (tmp_path / f"file_{i}.sea").read_bytes()
        assert got == want[i], f"file {i}: multi-host bytes diverge"
        pcm = np.load(tmp_path / f"file_{i}.pcm.npy")
        np.testing.assert_array_equal(
            pcm, np.asarray(sea_decode(want[i]).samples),
            err_msg=f"file {i}: multi-host decode PCM diverges",
        )

    stv = EncoderSettings(
        frames_per_chunk=100, scale_factor_frames=10,
        residual_bits=2.5, vbr=True,
    )
    want_v = encode_corpus(files, 44100, channels, stv)
    for i in range(n_files):
        got = (tmp_path / f"file_{i}.vbr.sea").read_bytes()
        assert got == want_v[i], f"file {i}: multi-host VBR bytes diverge"


def test_shard_files_across_hosts_partition():
    """Single-process sanity: the shard helper covers every file exactly
    once for any host count (pure-python check of the partition math)."""
    from sea_codec_tpu.parallel import distributed as d

    class _FakeJax:
        def __init__(self, procs, me):
            self._p, self._m = procs, me

    for procs in (1, 2, 3, 4, 7):
        seen = []
        for me in range(procs):
            per = -(-10 // procs)
            lo, hi = me * per, min((me + 1) * per, 10)
            seen.extend(range(lo, hi))
        assert sorted(seen) == list(range(10)), (procs, seen)
    # and the live helper agrees with process_count()==1
    assert list(d.shard_files_across_hosts(5)) == [0, 1, 2, 3, 4]


def test_batch_cli_distributed_two_processes(tmp_path):
    """End-to-end: two `batch_cli --distributed --coordinator ...` processes
    (the explicit-coordinator flags for clusters jax cannot auto-detect)
    split a wav corpus and together produce exactly the bytes a
    single-process encode produces."""
    import os

    from sea_codec_tpu import EncoderSettings
    from sea_codec_tpu.batch import encode_corpus
    from sea_codec_tpu.utils.signal import varied_signal
    from sea_codec_tpu.utils.wav import write_wav

    n_files, channels, rate = 4, 2, 44100
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    sigs = [varied_signal(channels, 220 + 13 * i, seed=300 + i) for i in range(n_files)]
    for i, s in enumerate(sigs):
        write_wav(s, channels, rate, str(indir / f"f{i}.wav"))

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the sitecustomize that force-selects the TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def run_cluster():
        port = _free_port()
        workers = []
        for pid in range(2):
            workers.append(
                subprocess.Popen(
                    [
                        sys.executable, "-m", "sea_codec_tpu.batch_cli",
                        str(indir / "*.wav"), str(outdir),
                        "-c", "200", "-d", "10",
                        "--distributed",
                        "--coordinator", f"localhost:{port}",
                        "--num-processes", "2",
                        "--process-id", str(pid),
                    ],
                    cwd=str(REPO), env=env,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                )
            )
        outs = [w.communicate(timeout=540)[0] for w in workers]
        return workers, "\n".join(o.decode(errors="replace")[-4000:] for o in outs)

    workers, text = run_cluster()
    if any(w.returncode for w in workers):
        # The coordinator handshake can time out on a heavily loaded box
        # (observed once with the full suite + a TPU bench sharing the
        # machine). Retry ONLY that infra class, on a fresh port; anything
        # else -- including byte divergence below -- still fails hard.
        infra = ("DEADLINE_EXCEEDED", "barrier", "UNAVAILABLE", "bind")
        if not any(m in text for m in infra):
            pytest.fail(text)
        workers, text = run_cluster()
        if any(w.returncode for w in workers):
            pytest.fail(text)

    st = EncoderSettings(frames_per_chunk=200, scale_factor_frames=10)
    want = encode_corpus(sigs, rate, channels, st)
    for i in range(n_files):
        got = (outdir / f"f{i}.sea").read_bytes()
        assert got == want[i], f"f{i}.sea: distributed CLI bytes diverge"
