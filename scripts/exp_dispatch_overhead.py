"""Quantify the relay's fixed per-dispatch overhead on device timings.

Times the corpus CBR encode scan at g in {4, 8} lane blocks per program,
three ways: first-element fetch, last-element fetch (both sync one
program), and back-to-back (4 programs enqueued, one final fetch -- the
device serializes them, so total/4 isolates device time from the client
round trip).

RESULTS (TPU v5e via relay, 2026-08-18):
  g=4 fetch first/last:  46.5 / 49.1 ms   (903 / 854 Msps)
  g=4 back-to-back /4:   26.7 ms          (1573 Msps)
  g=8 fetch first/last:  65.8 / 65.1 ms   (1276 / 1289 Msps)
  g=8 back-to-back /4:   44.9 ms          (1870 Msps)
Single block, single sync (exp fold attribution): 30.4 ms for work that
takes ~5.6 ms device-side -- i.e. EVERY synced call carries a fixed
~20-25 ms dispatch/round-trip cost. Consequences:
  - the encode search kernel's true device rate is ~1.9 Gsps-lane at
    l=128, not the ~350 Msps-lane single-sync probes report;
  - apparent "lane-width scaling" (350/600/900 Msps-lane at l=128/256/512,
    scripts/perf_encode_lanes.py) is the fixed cost diluting over 4x the
    work per call -- per-lane device throughput is flat in lane width, so
    the corpus keeps 128-lane blocks;
  - bench device-stage batch sizes are chosen so the fixed cost is <10%
    of each timed call (bench.py x_device_encode / x_device_encode_vbr /
    x_device_consumer).
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from functools import partial
from sea_codec_tpu.ops import lms as lms_ops
from sea_codec_tpu.ops.encode_file import _corpus_cbr_scan, corpus_n_valid
from sea_codec_tpu.utils.signal import varied_signal

channels, fpc, sff, sfb, rsz = 2, 5120, 20, 4, 3
nfb, ncb = 64, 16
b = nfb * channels
one_file = varied_signal(channels, ncb * fpc, seed=31337)
x1 = jnp.asarray(one_file.reshape(ncb, fpc, channels))
frames = jnp.full((b,), ncb * fpc, jnp.int32)
nv1 = jax.jit(partial(corpus_n_valid, nc=ncb, fpc=fpc, sff=sff, full_only=False))(frames)
h0 = jnp.asarray(np.tile(lms_ops.initial_history(channels), (nfb, 1)))
w0 = jnp.asarray(np.tile(lms_ops.initial_weights(channels), (nfb, 1)))
p0 = jnp.zeros((b,), jnp.int32)

for g in (4, 8):
    x = jax.block_until_ready(jax.jit(lambda s: jnp.tile(s[None], (g, 1, 1, nfb)))(x1))
    nv = jnp.tile(nv1[None], (g, 1, 1, 1))
    hg = jnp.tile(h0[None], (g, 1, 1)); wg = jnp.tile(w0[None], (g, 1, 1))
    pg = jnp.tile(p0[None], (g, 1))
    n_s = g * nfb * ncb * fpc * channels

    fn = partial(jax.jit, static_argnums=(5, 6, 7, 8))(
        lambda s, n, h, w, p, a, b2, c, d: jax.lax.map(
            lambda ar: _corpus_cbr_scan(ar[0], ar[1], ar[2], ar[3], ar[4],
                                        a, b2, c, d)[0],
            (s, n, h, w, p)))
    r = fn(x, nv, hg, wg, pg, sff, sfb, rsz, True)
    jax.block_until_ready(r)
    np.asarray(r[0, 0, 0, 0])

    for name, idx in (("first", (0, 0, 0, 0)), ("last", (-1, -1, -1, -1))):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(x, nv, hg, wg, pg, sff, sfb, rsz, True)
            np.asarray(r[idx])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"g={g} fetch {name:5s}: {t*1e3:7.1f} ms  {n_s/t/1e6:6.1f} Msps",
              file=sys.stderr)
    # back-to-back: 4 enqueues, one sync at the end; per-run = total/4
    t0 = time.perf_counter()
    for _ in range(4):
        r = fn(x, nv, hg, wg, pg, sff, sfb, rsz, True)
    np.asarray(r[-1, -1, -1, -1])
    t = (time.perf_counter() - t0) / 4
    print(f"g={g} back2back/4:  {t*1e3:7.1f} ms  {n_s/t/1e6:6.1f} Msps",
          file=sys.stderr)
