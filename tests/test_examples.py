"""Smoke-run every script in examples/ (tiny shapes, CPU).

Each example asserts its own correctness property internally (byte/sample
identity, metadata round trip); this test guarantees the documented
walkthroughs keep executing as the library evolves."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = sorted(p.name for p in (ROOT / "examples").glob("*.py"))

ARGS = {
    "transcode.py": ["--frames", "12000", "--fpc", "1000"],
    "streaming.py": ["--frames", "12000", "--fpc", "1000"],
    "seek.py": ["--frames", "30000", "--start", "12345", "--count", "500"],
    "corpus.py": ["--files", "3", "--frames", "3000", "--fpc", "1000"],
    "distributed.py": ["--files", "4", "--frames", "300", "--fpc", "200"],
    "metadata.py": [],
}


def test_every_example_has_smoke_args():
    assert set(EXAMPLES) == set(ARGS), "examples/ and ARGS out of sync"


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / name), *ARGS.get(name, [])],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, f"{name} failed:\n{proc.stdout}\n{proc.stderr}"
    assert proc.stdout.strip(), f"{name} printed nothing"
