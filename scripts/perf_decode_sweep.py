"""Microbench: decode-kernel tuning sweep (unroll x sublanes x time_block).

Measures the raw Pallas LMS decode kernel on the corpus shape bench.py uses
(24576 stereo chunks x 5120 frames), with the dequant prolog excluded so the
numbers isolate the kernel. Run on the real TPU.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from sea_codec_tpu.ops.pallas_decode import lms_decode_lanes


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    fpc = 5120
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 24576
    c = 2
    b = n_chunks * c
    rng = np.random.default_rng(0)
    # dq values in a realistic range (residual size 3, sf up to ~2000)
    dq_host = rng.integers(-4000, 4000, size=(fpc, b), dtype=np.int32)
    lms_host = np.zeros((8, b), dtype=np.int32)
    lms_host[6] = -(1 << 13)
    lms_host[7] = 1 << 14

    n_samples = fpc * b
    results = []
    for sublanes in (16, 32, 64):
        lane_block = sublanes * 128
        b_pad = -(-b // lane_block) * lane_block
        dq = jnp.zeros((fpc, b_pad), jnp.int32).at[:, :b].set(dq_host)
        lms = jnp.zeros((8, b_pad), jnp.int32).at[:, :b].set(lms_host)
        r = b_pad // 128
        dq3 = dq.reshape(fpc, r, 128)
        lms3 = lms.reshape(8, r, 128)
        for tb in (256, 512, 1024):
            if tb * sublanes > 4096 * 8:  # VMEM guard (x4B x2 buf)
                continue
            if fpc % tb:
                continue
            for unroll in (1, 2, 4, 8):
                try:
                    out = lms_decode_lanes(
                        dq3, lms3, time_block=tb, sublanes=sublanes, unroll=unroll
                    )
                    _ = np.asarray(out[0, 0, 0])
                except Exception as e:
                    print(f"s={sublanes} tb={tb} u={unroll}: FAIL {type(e).__name__}: {str(e)[:100]}",
                          file=sys.stderr)
                    continue
                ts = []
                for _ in range(6):
                    t0 = time.perf_counter()
                    out = lms_decode_lanes(
                        dq3, lms3, time_block=tb, sublanes=sublanes, unroll=unroll
                    )
                    _ = np.asarray(out[0, 0, 0])
                    ts.append(time.perf_counter() - t0)
                t = min(ts)
                msps = n_samples / t / 1e6
                results.append((msps, sublanes, tb, unroll))
                print(f"s={sublanes:3d} tb={tb:4d} u={unroll}: {t*1e3:7.1f} ms  {msps:8.1f} Msps",
                      file=sys.stderr, flush=True)
    results.sort(reverse=True)
    print("top5:", file=sys.stderr)
    for msps, s, tb, u in results[:5]:
        print(f"  {msps:8.1f} Msps  sublanes={s} tb={tb} unroll={u}", file=sys.stderr)


if __name__ == "__main__":
    main()
