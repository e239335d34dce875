"""Batch (rectangular) decode must be bit-identical to the session decoder."""

import numpy as np
import pytest

from sea_codec_tpu import EncoderSettings, sea_decode, sea_encode
from sea_codec_tpu.batch import decode_sea
from sea_codec_tpu.utils.signal import TEST_SAMPLE_RATE, gen_test_signal


@pytest.mark.parametrize("vbr", [False, True])
@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("frames", [999, 1000, 5000, 12345])
def test_batch_matches_session(vbr, channels, frames):
    samples = gen_test_signal(channels, frames)
    n = samples.shape[0] // channels
    samples = samples[: n * channels]
    settings = EncoderSettings(
        frames_per_chunk=1000, residual_bits=2.5 if vbr else 3.0, vbr=vbr
    )
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings, engine="session")

    session = sea_decode(encoded, engine="session")
    batched = decode_sea(encoded, device_batch=4)
    np.testing.assert_array_equal(np.asarray(batched.samples), np.asarray(session.samples))
    assert batched.sample_rate == session.sample_rate
    assert batched.channels == session.channels


def test_batch_full_size_ragged_final_chunk():
    """A final chunk one frame short can still serialize to chunk_size bytes
    (rs=1, mono): the batch parser must trim it via frames_real."""
    samples = gen_test_signal(1, 5120 * 2 - 1)[: 5120 * 2 - 1]
    settings = EncoderSettings(residual_bits=1.0)
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 1, settings)
    session = sea_decode(encoded)
    batched = decode_sea(encoded)
    np.testing.assert_array_equal(np.asarray(batched.samples), np.asarray(session.samples))


@pytest.mark.parametrize("vbr", [False, True])
@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("frames", [999, 1000, 5000, 12345])
def test_fast_encode_matches_session(vbr, channels, frames):
    from sea_codec_tpu.batch import encode_sea

    samples = gen_test_signal(channels, frames)
    n = samples.shape[0] // channels
    samples = samples[: n * channels]
    settings = EncoderSettings(
        frames_per_chunk=1000, residual_bits=2.5 if vbr else 3.0, vbr=vbr
    )
    session = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings, engine="session")
    fast = encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    assert fast == session


def test_decode_range_seek():
    from sea_codec_tpu.batch import decode_range

    samples = gen_test_signal(2, 12345)
    n = samples.shape[0] // 2
    samples = samples[: n * 2]
    encoded = sea_encode(samples, TEST_SAMPLE_RATE, 2, EncoderSettings(frames_per_chunk=1000))
    full = np.asarray(sea_decode(encoded).samples)
    for start, count in [(0, 100), (999, 2), (5500, 3000), (n - 10, 100)]:
        got = decode_range(encoded, start, count)
        want = full[start * 2 : (start + min(count, n - start)) * 2]
        np.testing.assert_array_equal(got, want)


def test_decode_corpus_skip_bad_files():
    from sea_codec_tpu.batch import decode_corpus

    samples = gen_test_signal(1, 3000)
    good = sea_encode(samples, TEST_SAMPLE_RATE, 1, EncoderSettings(frames_per_chunk=1000))
    bad = b"not a sea file"
    results = decode_corpus([good, bad, good], on_error="skip")
    assert results[1] is None
    np.testing.assert_array_equal(
        np.asarray(results[0].samples), np.asarray(results[2].samples)
    )


def test_decode_corpus_matches_single():
    from sea_codec_tpu.batch import decode_corpus

    files = []
    expected = []
    for ch, frames in [(1, 2500), (2, 7003), (3, 1000)]:
        s = gen_test_signal(ch, frames)
        s = s[: (s.shape[0] // ch) * ch]
        f = sea_encode(s, TEST_SAMPLE_RATE, ch, EncoderSettings(frames_per_chunk=1000))
        files.append(f)
        expected.append(np.asarray(sea_decode(f).samples))
    results = decode_corpus(files)
    for r, e in zip(results, expected):
        np.testing.assert_array_equal(np.asarray(r.samples), e)


def test_parsed_concat_batches_same_config_files():
    """parsed_concat (shared by bench.py and the perf scripts) concatenates
    the full-chunk sections of same-config files and skips files without a
    rectangular section; decoding the batch reproduces each file's PCM."""
    from sea_codec_tpu.batch import parsed_concat
    from sea_codec_tpu.utils.errors import SeaInvalidFrame
    from sea_codec_tpu.ops import tables
    from sea_codec_tpu.ops.device_decode import decode_chunks_packed

    st = EncoderSettings(frames_per_chunk=1000)
    sigs = []
    blobs = []
    for frames in (3000, 2000, 700):  # 700 < fpc: tail-only
        s = gen_test_signal(2, frames)[: frames * 2]  # exact frame count
        sigs.append(s)
        blobs.append(sea_encode(s, TEST_SAMPLE_RATE, 2, st))
    header, cfg, cat = parsed_concat(blobs)
    assert header is not None
    # 3 + 2 full chunks; the 700-frame file contributes none
    assert cat[0].shape[0] == 5
    import jax.numpy as jnp

    dqt_flat = jnp.asarray(
        tables.dqt_stacked(cfg.scale_factor_bits).reshape(-1), jnp.int32
    )
    pcm = np.asarray(
        decode_chunks_packed(
            *(jnp.asarray(a) for a in cat), dqt_flat,
            scale_factor_frames=cfg.scale_factor_frames, frames=1000,
            residual_size=cfg.residual_size,
        )
    )
    want = np.asarray(sea_decode(blobs[0]).samples).reshape(-1, 2)[:3000]
    np.testing.assert_array_equal(pcm[:3].reshape(-1, 2), want)
    want1 = np.asarray(sea_decode(blobs[1]).samples).reshape(-1, 2)[:2000]
    np.testing.assert_array_equal(pcm[3:5].reshape(-1, 2), want1)

    with pytest.raises(SeaInvalidFrame):
        parsed_concat([blobs[2]])  # no full chunks anywhere -> error


def test_encode_corpus_lane_packed_on_cpu():
    """The lane-packed corpus path runs on every backend (XLA window kernel
    off-TPU) and stays byte-identical to per-file encoding."""
    from sea_codec_tpu.batch import encode_corpus

    files = [gen_test_signal(2, n)[: (gen_test_signal(2, n).shape[0] // 2) * 2] for n in (2500, 999)]
    settings = EncoderSettings(frames_per_chunk=1000)
    out = encode_corpus(files, TEST_SAMPLE_RATE, 2, settings)
    for f, enc in zip(files, out):
        assert enc == sea_encode(f, TEST_SAMPLE_RATE, 2, settings)


@pytest.mark.parametrize("vbr", [False, True])
def test_corpus_varied_lengths_ragged_tails(vbr):
    """A corpus with many distinct lengths (sub-chunk files, ragged tails)
    exercises the batched tail paths: VBR tail encodes pack into lane
    buckets and corpus decode batch-decodes every tail in one shared call.
    Everything must stay byte/sample-identical to the per-file engines."""
    from sea_codec_tpu.batch import decode_corpus, encode_corpus
    from sea_codec_tpu.utils.signal import varied_signal

    rng = np.random.default_rng(11 + vbr)
    settings = EncoderSettings(
        frames_per_chunk=500, residual_bits=2.5 if vbr else 3.0, vbr=vbr
    )
    lens = [int(x) for x in rng.integers(120, 1600, size=14)] + [500, 1000, 77]
    files = [varied_signal(2, n, seed=100 * vbr + i) for i, n in enumerate(lens)]
    out = encode_corpus(files, TEST_SAMPLE_RATE, 2, settings)
    for f, enc in zip(files, out):
        assert enc == sea_encode(f, TEST_SAMPLE_RATE, 2, settings)
    decs = decode_corpus(out)
    for enc, dec in zip(out, decs):
        np.testing.assert_array_equal(
            np.asarray(dec.samples), np.asarray(sea_decode(enc).samples)
        )


@pytest.mark.parametrize(
    "channels,sfb,sff,rb,fpc,vbr,frames",
    [
        (5, 5, 2, 3.0, 1000, False, 792),   # single ragged chunk, byte-size == chunk_size
        (8, 3, 4, 2.5, 640, True, 194),     # VBR sub-chunk file
        (5, 5, 8, 8.0, 5120, True, 3694),   # VBR max bitrate, ragged
        (5, 4, 4, 2.0, 200, True, 8096),    # negative normalized base (saturates to 0)
    ],
)
def test_fuzz_regressions(channels, sfb, sff, rb, fpc, vbr, frames):
    """Edge configs found by differential fuzzing (see git history)."""
    from sea_codec_tpu.batch import encode_sea

    rng = np.random.default_rng(frames)
    samples = (np.sin(np.arange(frames * channels) * 0.01) * 20000).astype(np.int16)
    settings = EncoderSettings(
        scale_factor_bits=sfb, scale_factor_frames=sff,
        residual_bits=rb, frames_per_chunk=fpc, vbr=vbr,
    )
    a = sea_encode(samples, TEST_SAMPLE_RATE, channels, settings)
    c = encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    assert a == c
    d1 = np.asarray(sea_decode(a).samples)
    d3 = np.asarray(decode_sea(a).samples)
    np.testing.assert_array_equal(d1, d3)
    assert d1.shape[0] == frames * channels


@pytest.mark.parametrize(
    "channels,kwargs",
    [
        (300, {}),
        (0, {}),
        (2, dict(scale_factor_bits=9)),
        (2, dict(scale_factor_bits=0)),
        (2, dict(residual_bits=0.5)),
        (2, dict(residual_bits=9.0)),
        (2, dict(scale_factor_frames=7)),  # does not divide frames_per_chunk
        (2, dict(frames_per_chunk=0)),
    ],
)
def test_batch_engines_validate_parameters(channels, kwargs):
    """The fast batch engines must reject invalid parameters with the same
    SeaError surface as the session engine (advisor finding, round 1)."""
    from sea_codec_tpu.batch import encode_corpus, encode_sea
    from sea_codec_tpu.utils.errors import SeaInvalidParameters

    settings = EncoderSettings(**kwargs)
    samples = np.zeros(600 * max(channels, 1), dtype=np.int16)
    with pytest.raises(SeaInvalidParameters):
        encode_sea(samples, TEST_SAMPLE_RATE, channels, settings)
    with pytest.raises(SeaInvalidParameters):
        encode_corpus([samples], TEST_SAMPLE_RATE, channels, settings)


def test_decode_corpus_bounded_drain(monkeypatch):
    """SEA_DECODE_MAX_LIVE_BYTES bounds live device outputs: with the
    threshold forced to 1 byte the fetch drains after every dispatched
    batch (many waves) and must produce byte-identical results to the
    default single-drain pipeline (advisor finding, round 4: peak device
    memory scales with the whole corpus's decoded PCM)."""
    from sea_codec_tpu.batch import decode_corpus, encode_corpus
    from sea_codec_tpu.utils.signal import varied_signal

    channels, fpc = 2, 100
    st = EncoderSettings(residual_bits=3.0, frames_per_chunk=fpc)
    sigs = [varied_signal(channels, n, seed=n) for n in (350, 700, 37, 100)]
    enc = encode_corpus(sigs, TEST_SAMPLE_RATE, channels, st)
    want = decode_corpus(enc, device_batch=2)
    monkeypatch.setenv("SEA_DECODE_MAX_LIVE_BYTES", "1")
    got = decode_corpus(enc, device_batch=2)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.samples, g.samples)
