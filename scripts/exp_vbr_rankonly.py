"""Experiment: does the ranks_only VBR analyze-pass kernel variant pay?

Pass 1 of the two-pass VBR encode only needs per-window error ranks --
the reference discards pass-1 codes outright (encoder_vbr.rs:139-171) --
so the search kernel has a ranks_only variant (ops/pallas_encode.py,
landed round 4) that elides the candidate-code scratch stores and the
per-window winner-code selection and shrinks the code scratch to one
row. The production VBR corpus scan already runs pass 1 with it
(ops/encode_file.py::_corpus_vbr_scan). This probe measures the variant
head-to-head against the full kernel at the corpus pass-1 geometry
(fpc=5120, sff=20, sfb=4, 512 lanes -- the bench block shape) so the
accept/reject decision is recorded with numbers rather than a commit
message: if the elided stores were on the latency-bound dependent chain,
ranks_only should beat full; if the chain is the bound, they tie and the
variant's value is VMEM headroom only.

Run: python scripts/exp_vbr_rankonly.py      (needs the TPU)
Decision recorded in docs/PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# keep experiment programs OUT of the shipped .jax_cache
jax.config.update("jax_compilation_cache_dir", None)

from sea_codec_tpu.ops.pallas_encode import (  # noqa: E402
    pack_state,
    prepare_n_valid,
    prepare_window_streams,
    run_window_search,
)
from sea_codec_tpu.utils.signal import varied_signal  # noqa: E402

SFF, SFB, FPC, L = 20, 4, 5120, 512
S = 1 << SFB
W = FPC // SFF
BASE = 2  # bench VBR targets ~2.x bits: analyze pass runs at BASE + 1
REPS = 5


def main() -> None:
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    rng = np.random.default_rng(7)
    sig = np.stack(
        [varied_signal(1, FPC, seed=int(rng.integers(1 << 30))) for _ in range(L)],
        axis=1,
    ).astype(np.int32)  # [FPC, L] -- one varied file per lane
    smp = jnp.asarray(sig)

    rs1 = jnp.full((W, L), BASE + 1, jnp.int32)
    streams1, wb, wp = prepare_window_streams(rs1, SFF, SFB, L)
    nv = prepare_n_valid(jnp.full((W, L), SFF, jnp.int32), wp, L)
    hist0 = jnp.zeros((L, 4), jnp.int32)
    wts0 = (
        jnp.zeros((L, 4), jnp.int32).at[:, 2].set(-(1 << 13)).at[:, 3].set(1 << 14)
    )
    state0 = pack_state(hist0, wts0, jnp.zeros((L,), jnp.int32), S, L)

    K = 16  # kernel invocations per program: ONE relay dispatch (~25 ms
    # fixed) covers K dependent kernel runs, so the A/B measures the
    # ~1.3 ms kernels and not the dispatch (bench's "sustained" shape)

    def make(ranks_only: bool):
        def step(state, _):
            _codes, _sf, ranks, st = run_window_search(
                state, smp, nv, streams1, wb, wp, SFF, SFB, L,
                all_valid=True, ranks_only=ranks_only,
            )
            return st, ranks

        def f(state):
            st, ranks = jax.lax.scan(step, state, None, length=K)
            return ranks[-1], st

        return jax.jit(f)

    def sync(out):
        # fetch one element: over the relay, block_until_ready can return
        # at enqueue-ack; a fetch is the trustworthy sync
        return np.asarray(out[1][0, 0, 0])

    results = {}
    outs = {}
    for name, ro in (("ranks_only", True), ("full", False)):
        f = make(ro)
        out = f(state0)
        sync(out)  # compile + warm
        outs[name] = out
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(f(state0))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        results[name] = best
        print(
            f"{name:>10}: best {best * 1e3:7.2f} ms over {REPS} for {K} "
            f"kernel runs ({FPC * L * K / best / 1e6:6.0f} Msamples/s-lane)"
        )

    # the variants must agree on what pass 2 consumes: ranks + carried state
    for a, b in zip(outs["ranks_only"], outs["full"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    speedup = results["full"] / results["ranks_only"]
    print(f"ranks_only speedup vs full kernel (pass-1 A/B): {speedup:.3f}x")
    # two-pass framing: pass 2 always runs the full kernel, so with
    # pass1 ~= pass2 the e2e encode gain is halved
    print(f"implied e2e VBR encode gain (pass1 ~= pass2): "
          f"{(1 - (1 + 1 / speedup) / 2) * 100:.1f}%")


if __name__ == "__main__":
    main()
