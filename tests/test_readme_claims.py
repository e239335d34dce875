"""Drift guard: every bench field the README's performance table cites must
actually exist in bench.py's emitted JSON, so no documented claim can
silently lose its artifact backing (the round-2 failure mode: README rows
whose BENCH fields came back null/missing)."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def emitted_fields() -> set[str]:
    """Keys of the JSON object bench.py emits (parsed from the `out = {`
    literal in emit(); quoted keys only, comments ignored)."""
    src = (ROOT / "bench.py").read_text()
    m = re.search(r"out = \{(.*?)\n    \}", src, re.S)
    assert m, "bench.py emit() dict literal not found"
    return set(re.findall(r'^\s*"([a-zA-Z0-9_]+)":', m.group(1), re.M))


def readme_cited_fields() -> set[str]:
    """Backtick-quoted bench-field names in the README performance table
    (the `bench field` column of rows between the table header and the
    next section)."""
    src = (ROOT / "README.md").read_text()
    m = re.search(r"\| metric \| this framework.*?\n(\|.*?\n)+", src)
    assert m, "README performance table not found"
    cited = set()
    for row in m.group(0).splitlines()[2:]:
        cells = [c.strip() for c in row.strip().strip("|").split("|")]
        if len(cells) >= 4:
            cited.update(re.findall(r"`([a-zA-Z0-9_]+)`", cells[-1]))
    return cited


def test_readme_perf_fields_exist_in_bench():
    emitted = emitted_fields()
    cited = readme_cited_fields()
    assert cited, "README performance table cites no bench fields"
    missing = cited - emitted - {"value"}  # `value` is the headline key
    assert not missing, f"README cites bench fields not emitted: {missing}"


def test_bench_emits_headline_and_core_fields():
    emitted = emitted_fields()
    for k in (
        "value",
        "vs_baseline",
        "decode_sustained_Msps",
        "corpus_encode_device_Msps",
        "vbr_decode_device_Msps",
        "vbr_encode_device_Msps",
        "e2e_device_consumer_Msps",
        "corpus1000_encode_Msps",
        "corpus1000_decode_Msps",
        "mono_roundtrip_ms",
        "multichannel8_roundtrip_ms",
        "failed_stages",
        "cache_new_entries",
    ):
        assert k in emitted, f"bench.py no longer emits {k}"
