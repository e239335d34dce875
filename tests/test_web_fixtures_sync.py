"""Drift guard: web/test_fixtures.json stays in sync with the pytest suite.

The browser/node suite (web/run_tests.mjs, run in CI) is only as strong as
the checked-in fixture file. This re-derives the generator's inputs -- the
golden ``.sea`` artifacts (tests/fixtures/*.npz) and the 24-config
reference-convention VBR anchor matrix (test_fixtures.ANCHOR_MATRIX, the
same streams scripts/gen_web_fixtures.py exports) -- and asserts the JSON
carries exactly those entries with byte-identical encoded streams. Decoded
PCM drift is covered transitively: test_fixtures.py pins every decoder in
the repo to the same streams.
"""

from __future__ import annotations

import base64
import glob
import json
import os

import numpy as np
import test_fixtures as tf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(os.path.join(ROOT, "web", "test_fixtures.json")) as f:
        return json.load(f)


def test_web_fixture_key_set_matches_generator_inputs():
    entries = _load()
    want = {
        os.path.basename(p)[:-4]
        for p in glob.glob(os.path.join(ROOT, "tests", "fixtures", "*.npz"))
    }
    for i, cfg in enumerate(tf.ANCHOR_MATRIX):
        rs, _deltas, c, _sff, _fpc, sfb, _n, _tail = cfg
        want.add(f"anchor{i:02d}_rs{rs}_c{c}_sfb{sfb}")
    for seed in range(2 * len(tf.FUZZ_POOL)):
        c = tf.FUZZ_POOL[seed % len(tf.FUZZ_POOL)][0]
        want.add(f"fuzz{seed:03d}_c{c}")
    assert set(entries) == want, (
        "web/test_fixtures.json is stale -- rerun scripts/gen_web_fixtures.py"
    )


def test_web_fixture_golden_bytes_match_npz():
    entries = _load()
    for p in sorted(glob.glob(os.path.join(ROOT, "tests", "fixtures", "*.npz"))):
        fx = np.load(p)
        name = os.path.basename(p)[:-4]
        got = base64.b64decode(entries[name]["encoded"])
        assert got == fx["encoded"].tobytes(), f"{name}: encoded bytes drifted"
        assert entries[name]["channels"] == int(fx["channels"])
        assert entries[name]["rate"] == int(fx["sample_rate"])


def test_web_fixture_anchor_streams_match_matrix():
    entries = _load()
    for i, cfg in enumerate(tf.ANCHOR_MATRIX):
        rs, _deltas, c, _sff, _fpc, sfb, _n, _tail = cfg
        name = f"anchor{i:02d}_rs{rs}_c{c}_sfb{sfb}"
        enc = tf.anchored_matrix_stream(cfg, seed=100 + i)
        got = base64.b64decode(entries[name]["encoded"])
        assert got == bytes(enc), (
            f"{name}: anchor stream drifted -- rerun scripts/gen_web_fixtures.py"
        )
        assert entries[name]["decode_only"] is True
        assert entries[name]["channels"] == c


def test_web_fixture_fuzz_streams_match_generator():
    entries = _load()
    for seed in range(2 * len(tf.FUZZ_POOL)):
        c = tf.FUZZ_POOL[seed % len(tf.FUZZ_POOL)][0]
        name = f"fuzz{seed:03d}_c{c}"
        enc, _meta, _hdr = tf.fuzz_stream(seed)
        got = base64.b64decode(entries[name]["encoded"])
        assert got == bytes(enc), (
            f"{name}: fuzz stream drifted -- rerun scripts/gen_web_fixtures.py"
        )
        assert entries[name]["decode_only"] is True
