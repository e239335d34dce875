"""CLI tests: flag surface, validation, wav<->sea conversion."""

import subprocess
import sys
import os

import numpy as np
import pytest

from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, audio_quality, gen_test_signal
from sea_codec_tpu.utils.wav import read_wav, write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "sea_codec_tpu", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "in.wav"
    samples = gen_test_signal(2, 30000)
    write_wav(samples, 2, TEST_SAMPLE_RATE, str(path))
    return str(path), samples


def test_wav_roundtrip_io(tmp_path):
    samples = gen_test_signal(2, 1000)
    p = tmp_path / "x.wav"
    write_wav(samples, 2, 48000, str(p))
    wave = read_wav(str(p))
    assert wave.channels == 2 and wave.sample_rate == 48000
    np.testing.assert_array_equal(wave.samples, samples)


def test_cli_encode_decode(wav_file, tmp_path):
    wav_in, samples = wav_file
    sea = str(tmp_path / "out.sea")
    wav_out = str(tmp_path / "out.wav")
    r = run_cli(wav_in, sea, "-b", "3")
    assert r.returncode == 0, r.stderr
    r = run_cli(sea, wav_out)
    assert r.returncode == 0, r.stderr
    decoded = read_wav(wav_out)
    assert decoded.samples.shape == samples.shape
    _, psnr = audio_quality(samples, decoded.samples)
    assert psnr < -20.0


def test_cli_vbr(wav_file, tmp_path):
    wav_in, samples = wav_file
    sea = str(tmp_path / "out.sea")
    r = run_cli(wav_in, sea, "-b", "2.5", "-v")
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(sea) < samples.nbytes / 5


@pytest.mark.parametrize(
    "args,msg",
    [
        (["-c", "100"], "Chunk size must be between 200 and 32000"),
        (["-c", "64000"], "Chunk size must be between 200 and 32000"),
        (["-s", "2"], "Scale factor bits must be between 3 and 5"),
        (["-s", "6"], "Scale factor bits must be between 3 and 5"),
        (["-d", "13"], "Scale factor frames must be a divisor of chunk size"),
        (["-b", "9"], "Bitrate must be between 1.0 and 8.0"),
        (["-b", "2.5"], "Without VBR, bitrate must be an integer between 1 and 8"),
        (["-b", "1.2", "-v"], "With VBR, bitrate must be between 1.5 and 8.0"),
        (["-b", "x"], "Failed to parse residual bits"),
    ],
)
def test_cli_validation(wav_file, tmp_path, args, msg):
    wav_in, _ = wav_file
    r = run_cli(wav_in, str(tmp_path / "o.sea"), *args)
    assert r.returncode == 1
    assert msg in r.stderr


def test_cli_bad_extensions(tmp_path):
    r = run_cli("a.mp3", "b.ogg")
    assert r.returncode == 1
    assert "Invalid file extensions" in r.stderr


def test_cli_metadata(wav_file, tmp_path):
    wav_in, _ = wav_file
    sea = str(tmp_path / "m.sea")
    r = run_cli(wav_in, sea, "--metadata", "artist=x", "--metadata", "title=y")
    assert r.returncode == 0, r.stderr
    from sea_codec_tpu.container import SeaFileHeader
    with open(sea, "rb") as f:
        header = SeaFileHeader.from_reader(f)
    assert header.metadata == "artist=x\ntitle=y\n"


def test_cli_metadata_duplicate(wav_file, tmp_path):
    """Exact and case-differing duplicate -m flags die the same way (the
    exact form used to silently collapse via dict assignment)."""
    wav_in, _ = wav_file
    sea = str(tmp_path / "d.sea")
    for flags in (["--metadata", "a=1", "--metadata", "a=2"], ["--metadata", "A=1", "--metadata", "a=2"]):
        r = run_cli(wav_in, sea, *flags)
        assert r.returncode == 1
        assert "Duplicate metadata key" in r.stderr


def test_cli_stats_shows_raw_metadata_when_lenient_parse_drops_lines(tmp_path):
    """--stats on mixed structured/unstructured metadata prints the parsed
    pairs AND the raw bytes, so malformed lines are never silently hidden."""
    from sea_codec_tpu import EncoderSettings, sea_encode

    samples = gen_test_signal(1, 2000)
    enc = sea_encode(
        samples, TEST_SAMPLE_RATE, 1,
        EncoderSettings(frames_per_chunk=1000, metadata="good=1\nmalformed line\n"),
    )
    sea = tmp_path / "raw.sea"
    sea.write_bytes(enc)
    r = run_cli(str(sea), str(tmp_path / "raw.wav"), "--stats")
    assert r.returncode == 0, r.stderr
    assert "metadata: good=1" in r.stdout
    assert "metadata (raw):" in r.stdout


def test_cli_native_backend(wav_file, tmp_path):
    wav_in, samples = wav_file
    sea = str(tmp_path / "n.sea")
    wav_out = str(tmp_path / "n.wav")
    r = run_cli(wav_in, sea, "--backend", "native")
    assert r.returncode == 0, r.stderr
    # native and jax backends produce identical bytes
    sea2 = str(tmp_path / "j.sea")
    r = run_cli(wav_in, sea2)
    assert r.returncode == 0, r.stderr
    assert open(sea, "rb").read() == open(sea2, "rb").read()
    r = run_cli(sea, wav_out, "--backend", "native")
    assert r.returncode == 0, r.stderr
    decoded = read_wav(wav_out)
    assert decoded.samples.shape == samples.shape


def test_batch_cli_roundtrip(tmp_path):
    import glob as _glob

    indir = tmp_path / "wavs"; indir.mkdir()
    seadir = tmp_path / "seas"; wavdir = tmp_path / "out"
    sigs = {}
    for i, frames in enumerate((3000, 5000)):
        s = gen_test_signal(2, frames)
        s = s[: (s.shape[0] // 2) * 2]
        sigs[f"f{i}"] = s
        write_wav(s, 2, TEST_SAMPLE_RATE, str(indir / f"f{i}.wav"))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "sea_codec_tpu.batch_cli", str(indir / "*.wav"), str(seadir), "-b", "3"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    assert len(_glob.glob(str(seadir / "*.sea"))) == 2
    r = subprocess.run(
        [sys.executable, "-m", "sea_codec_tpu.batch_cli", str(seadir / "*.sea"), str(wavdir)],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    for name, s in sigs.items():
        out = read_wav(str(wavdir / f"{name}.wav"))
        assert out.samples.shape == s.shape


def test_wav_float_conversion_rounds_half_away(tmp_path):
    """Exact .5 scaled values must round away from zero (Rust f32::round),
    not half-to-even (advisor finding, round 1). k/65534 for odd k lands
    exactly on x.5 after the f32 multiply by 32767."""
    import struct

    vals = np.array(
        [k / 65534.0 for k in (1, 3, 5, 7, 9)]
        + [-k / 65534.0 for k in (1, 3, 5, 7, 9)],
        dtype=np.float32,
    )
    payload = vals.astype("<f4").tobytes()
    p = tmp_path / "f32.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF")
        f.write((36 + len(payload)).to_bytes(4, "little"))
        f.write(b"WAVE" b"fmt ")
        f.write((16).to_bytes(4, "little"))
        f.write(struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32))
        f.write(b"data")
        f.write(len(payload).to_bytes(4, "little"))
        f.write(payload)
    wave = read_wav(str(p))
    np.testing.assert_array_equal(
        wave.samples, np.array([1, 2, 3, 4, 5, -1, -2, -3, -4, -5], dtype=np.int16)
    )


def test_batch_cli_mesh_roundtrip(tmp_path):
    """--mesh shards the corpus over the (virtual) device mesh; outputs are
    byte-identical to the unsharded run."""
    from sea_codec_tpu.batch_cli import main as batch_main

    indir = tmp_path / "in"
    outdir = tmp_path / "sea"
    outdir2 = tmp_path / "sea2"
    indir.mkdir()
    for i in range(6):
        s = gen_test_signal(2, 700 + 100 * i)
        write_wav(s, 2, TEST_SAMPLE_RATE, str(indir / f"f{i}.wav"))
    assert batch_main([str(indir / "*.wav"), str(outdir), "-c", "200", "--mesh"]) == 0
    assert batch_main([str(indir / "*.wav"), str(outdir2), "-c", "200"]) == 0
    for i in range(6):
        a = (outdir / f"f{i}.sea").read_bytes()
        b = (outdir2 / f"f{i}.sea").read_bytes()
        assert a == b

    wavdir = tmp_path / "wav"
    assert batch_main([str(outdir / "*.sea"), str(wavdir), "--mesh"]) == 0
    for i in range(6):
        out = read_wav(str(wavdir / f"f{i}.wav"))
        assert out.samples.shape[0] > 0
