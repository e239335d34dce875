"""Regenerate web/test_fixtures.json.

Two sections:
- the golden ``.sea`` artifacts from tests/fixtures/*.npz (encode must be
  byte-identical, decode sample-identical -- the browser/node suite mirrors
  tests/test_fixtures.py);
- the reference-convention VBR anchor matrix (tests/test_fixtures.py::
  ANCHOR_MATRIX), exported as decode-only entries so the JS decoder is held
  to the same 24-config matrix the JAX, batch, and C++ decoders pin in
  pytest. Expected PCM comes from ``decode_sea`` and is cross-checked
  against the native C++ decoder here before export.

Run from the repo root: ``python scripts/gen_web_fixtures.py``.
"""

from __future__ import annotations

import base64
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")  # the boot hook ignores JAX_PLATFORMS

import numpy as np

from sea_codec_tpu.batch import decode_sea


def b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode("ascii")


def main() -> None:
    import test_fixtures as tf

    entries: dict[str, dict] = {}
    for p in sorted(glob.glob("tests/fixtures/*.npz")):
        fx = np.load(p)
        name = os.path.basename(p)[:-4]
        entries[name] = {
            "input": b64(fx["input"].astype("<i2").tobytes()),
            "encoded": b64(fx["encoded"].tobytes()),
            "decoded": b64(fx["decoded"].astype("<i2").tobytes()),
            "rate": int(fx["sample_rate"]),
            "channels": int(fx["channels"]),
            "sfb": int(fx["sfb"]),
            "sff": int(fx["sff"]),
            "rb": float(fx["rb"]),
            "fpc": int(fx["fpc"]),
            "vbr": bool(fx["vbr"]),
        }

    from sea_codec_tpu.native.binding import available, native_decode

    for i, cfg in enumerate(tf.ANCHOR_MATRIX):
        rs, _deltas, c, sff, fpc, sfb, n_chunks, tail = cfg
        enc = tf.anchored_matrix_stream(cfg, seed=100 + i)
        pcm = np.asarray(decode_sea(enc).samples).astype("<i2")
        if available():
            nat, _r, _c = native_decode(enc)
            np.testing.assert_array_equal(pcm, nat)
        entries[f"anchor{i:02d}_rs{rs}_c{c}_sfb{sfb}"] = {
            "encoded": b64(bytes(enc)),
            "decoded": b64(pcm.tobytes()),
            "rate": 44100,
            "channels": c,
            "decode_only": True,
        }

    # seeded subset of the VBR anchored-stream fuzz (tests/test_fixtures.py::
    # test_vbr_anchored_fuzz): two seeds per shape-pool entry, so the JS
    # decoder is held to the same randomized stream space as the JAX, batch,
    # and C++ decoders
    for seed in range(2 * len(tf.FUZZ_POOL)):
        enc, _meta, _hdr = tf.fuzz_stream(seed)
        c = tf.FUZZ_POOL[seed % len(tf.FUZZ_POOL)][0]
        pcm = np.asarray(decode_sea(enc).samples).astype("<i2")
        if available():
            nat, _r, _c = native_decode(enc)
            np.testing.assert_array_equal(pcm, nat)
        entries[f"fuzz{seed:03d}_c{c}"] = {
            "encoded": b64(bytes(enc)),
            "decoded": b64(pcm.tobytes()),
            "rate": 44100,
            "channels": c,
            "decode_only": True,
        }

    out = os.path.join("web", "test_fixtures.json")
    with open(out, "w") as f:
        json.dump(entries, f)
    print(f"wrote {out}: {len(entries)} fixtures, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
