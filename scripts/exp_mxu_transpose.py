"""A/B: XLA uint8 byte-plane transpose vs MXU identity-dot transposes.

docs/PERF.md lever 2: the fused CBR decode's prolog transpose
(u8 [N,B] -> [B,N], ~0.38 GB each way) measures ~4 ms/Gsample against a
~1 ms HBM roofline because XLA lowers it to per-element lane shuffles.
The MXU can do the same data movement as matmuls with an identity matrix:
``out[g,b,k] = sum_t in3[g,t,b] * I[t,k] = in3[g,k,b]`` transposes each
128-row tile, exactly (byte values 0..255 are exact in bf16; an int8
bitcast variant is exact by construction). The dot costs
N*B*128*2 flops = ~97 GFLOP at bench scale -- ~0.5 ms at the v5e's bf16
rate -- but emits [G,B,128] (g leading), so reaching the kernel's
[B,G,128] layout needs one extra leading-axis permute (pure HBM row moves,
no lane shuffles).

Variants measured at bench scale (98304 chunks x 3840 bytes):
  a) current:   jnp.transpose(u8)                       -> [B, N]
  b) mxu bf16:  identity dot + leading permute          -> [B, G, 128]
  c) mxu int8:  bitcast s8 identity dot + permute       -> [B, G, 128]
  d) mxu bf16, no permute (what a [G,B,128]-consuming kernel would pay)

Usage: python scripts/exp_mxu_transpose.py [mult]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from sea_codec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timeit(fn, reps=8):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def stream(fn, k=6, rounds=3):
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        np.asarray(r.reshape(-1)[0])
        t = (time.perf_counter() - t0) / k
        best = t if best is None or t < best else best
    return best


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    n, b = 128 * mult, 3840  # bench headline geometry (rs=3, fpc=5120, c=2)
    g = n // 128
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(128, b), dtype=np.uint8)
    x = jax.block_until_ready(
        jax.jit(lambda v: jnp.tile(v, (mult, 1)))(jnp.asarray(base))
    )
    eye_bf = jnp.eye(128, dtype=jnp.bfloat16)
    eye_s8 = jnp.eye(128, dtype=jnp.int8)

    @jax.jit
    def t_xla(v):
        return v.T  # [B, N]

    @jax.jit
    def t_mxu_bf16(v):
        v3 = v.reshape(g, 128, b).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            v3, eye_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, B, 128] = v3[g, k, b]
        return y.astype(jnp.uint8).transpose(1, 0, 2)  # [B, G, 128]

    @jax.jit
    def t_mxu_bf16_nop(v):
        v3 = v.reshape(g, 128, b).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            v3, eye_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.uint8)  # [G, B, 128]

    @jax.jit
    def t_mxu_s8(v):
        v3 = jax.lax.bitcast_convert_type(
            v.reshape(g, 128, b), jnp.int8
        )
        y = jax.lax.dot_general(
            v3, eye_s8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jax.lax.bitcast_convert_type(
            y.astype(jnp.int8), jnp.uint8
        ).transpose(1, 0, 2)

    want = np.asarray(t_xla(x)[:64, :256])
    got_b = np.asarray(t_mxu_bf16(x)).reshape(b, n)[:64, :256]
    assert np.array_equal(want, got_b), "bf16 dot transpose != XLA transpose"
    got_s = np.asarray(t_mxu_s8(x)).reshape(b, n)[:64, :256]
    assert np.array_equal(want, got_s), "s8 dot transpose != XLA transpose"
    print("bit-identical on probe window", file=sys.stderr)

    gb = n * b / 1e9
    for name, fn in (
        ("xla u8 transpose      ", t_xla),
        ("mxu bf16 dot + permute", t_mxu_bf16),
        ("mxu s8 dot + permute  ", t_mxu_s8),
        ("mxu bf16 dot, [G,B,:] ", t_mxu_bf16_nop),
    ):
        t = timeit(lambda: np.asarray(fn(x).reshape(-1)[0]))
        s = stream(lambda: fn(x))
        print(
            f"{name}: single {t * 1e3:7.2f} ms | sustained {s * 1e3:7.2f} ms"
            f" ({gb / s:5.1f} GB/s eff)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
