"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.batch import parse_file
from sea_codec_tpu.parallel.pipeline import (
    corpus_transcode_step,
    decode_chunk_batch_sharded,
    make_mesh,
)
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_decode_equals_single_device():
    """Chunk-parallel decode over the mesh == sequential session decode."""
    channels = 2
    settings = EncoderSettings(frames_per_chunk=1000)
    samples = gen_test_signal(channels, 16000)
    frames = samples.shape[0] // channels
    samples = samples[: frames * channels]
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    expected = np.asarray(sea_decode(encoded).samples)

    header, parsed, frames_real = parse_file(encoded)
    codes, sf, rs, hist, wts, sfb = parsed
    n = codes.shape[0]
    # pad the chunk batch to a multiple of the mesh size
    mesh = make_mesh(8)
    total = mesh.devices.size
    pad = (-n) % total
    codes, sf, rs, hist, wts = (
        np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        for a in (codes, sf, rs, hist, wts)
    )
    pcm = decode_chunk_batch_sharded(mesh, codes, sf, rs, hist, wts, sfb, 20)
    pcm = np.asarray(pcm)[:n]
    got = np.concatenate([pcm[i, : frames_real[i]].reshape(-1) for i in range(n)])
    np.testing.assert_array_equal(got, expected)


def test_corpus_transcode_step_runs_and_matches_api():
    """The fused multi-device encode+decode equals the host API round trip."""
    mesh = make_mesh(8)
    sff, fpc, nc, c = 5, 10, 4, 2
    nf = 4
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal((nf, nc, fpc, c)) * 2000).astype(np.int32)

    pcm, _codes = corpus_transcode_step(
        mesh, samples, residual_size=3, scale_factor_bits=4, scale_factor_frames=sff
    )
    pcm = np.asarray(pcm)

    settings = EncoderSettings(
        frames_per_chunk=fpc, scale_factor_frames=sff, residual_bits=3.0
    )
    for f in range(nf):
        flat = samples[f].reshape(-1, c).astype(np.int16).reshape(-1)
        expected = np.asarray(
            sea_decode(sea_encode(flat, TEST_SAMPLE_RATE, c, settings)).samples
        )
        np.testing.assert_array_equal(pcm[f].reshape(-1), expected)


def test_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_encode_corpus_mesh_byte_identical():
    """The real bytes pipeline on an 8-device mesh: encode_corpus with lane
    blocks sharded across the mesh produces bytes identical to per-file
    encoding (and to the single-device corpus path)."""
    from sea_codec_tpu.batch import encode_corpus, encode_sea

    mesh = make_mesh(8)
    c = 32  # 4 files per 128-lane block -> a 40-file corpus spans 10 blocks
    sig = gen_test_signal(c, 260)
    lens = [260, 250, 100, 73, 199] * 8
    files = [sig[: f * c] for f in lens]
    st = EncoderSettings(frames_per_chunk=100, scale_factor_frames=10)
    got = encode_corpus(files, TEST_SAMPLE_RATE, c, st, mesh=mesh)
    for i, f in enumerate(files[:5]):
        want = encode_sea(f, TEST_SAMPLE_RATE, c, st)
        assert got[i] == want, i
    assert got[:5] == got[5:10] == got[35:40]


def test_encode_corpus_mesh_vbr_byte_identical():
    from sea_codec_tpu.batch import encode_corpus, encode_sea

    mesh = make_mesh(4)
    c = 32
    sig = gen_test_signal(c, 210)
    files = [sig[: f * c] for f in (210, 200, 64)] * 4
    st = EncoderSettings(
        frames_per_chunk=100, scale_factor_frames=10, residual_bits=2.5, vbr=True
    )
    got = encode_corpus(files, TEST_SAMPLE_RATE, c, st, mesh=mesh)
    for i, f in enumerate(files[:3]):
        want = encode_sea(f, TEST_SAMPLE_RATE, c, st)
        assert got[i] == want, i


def test_decode_corpus_mesh_byte_identical():
    """Chunk-parallel decode of real .sea bytes sharded over the mesh."""
    from sea_codec_tpu.batch import decode_corpus, decode_sea, encode_sea

    mesh = make_mesh(8)
    c = 2
    sig = gen_test_signal(c, 3000)
    st = EncoderSettings(frames_per_chunk=250, scale_factor_frames=10)
    stv = EncoderSettings(
        frames_per_chunk=250, scale_factor_frames=10, residual_bits=2.5, vbr=True
    )
    encs = [
        encode_sea(sig[: f * c], TEST_SAMPLE_RATE, c, s)
        for f in (3000, 2990, 777)
        for s in (st, stv)
    ]
    got = decode_corpus(encs, mesh=mesh)
    for enc, out in zip(encs, got):
        want = decode_sea(enc)
        np.testing.assert_array_equal(np.asarray(out.samples), np.asarray(want.samples))


def test_mesh_corpus_fuzz_byte_identity():
    """Differential fuzz: random configs/lengths through the mesh corpus
    pipeline must be byte-identical to the single-device engines."""
    from sea_codec_tpu.batch import decode_corpus, decode_sea, encode_corpus, encode_sea

    mesh = make_mesh(8)
    rng = np.random.default_rng(1234)
    for trial in range(4):
        c = int(rng.choice([1, 2, 8, 32]))
        sfb = int(rng.integers(3, 6))
        sff = int(rng.choice([5, 10, 20]))
        fpc = sff * int(rng.integers(4, 11))
        vbr = bool(rng.integers(0, 2))
        rb = float(rng.integers(2, 5)) + (0.5 if vbr else 0.0)
        st = EncoderSettings(
            scale_factor_bits=sfb, scale_factor_frames=sff,
            residual_bits=rb, frames_per_chunk=fpc, vbr=vbr,
        )
        n_files = int(rng.integers(3, 10)) * (4 if c <= 2 else 1)
        sig = gen_test_signal(c, 3 * fpc + 7)
        files = [
            sig[: int(rng.integers(1, 3 * fpc + 7)) * c] for _ in range(n_files)
        ]
        got = encode_corpus(files, TEST_SAMPLE_RATE, c, st, mesh=mesh)
        for i in rng.choice(n_files, size=min(3, n_files), replace=False):
            assert got[i] == encode_sea(files[i], TEST_SAMPLE_RATE, c, st), (
                trial, c, sfb, sff, fpc, vbr, i,
            )
        dec = decode_corpus(got, mesh=mesh)
        for i in rng.choice(n_files, size=min(2, n_files), replace=False):
            np.testing.assert_array_equal(
                np.asarray(dec[i].samples),
                np.asarray(decode_sea(got[i]).samples),
            )
