"""Pallas TPU kernel for the LMS decode recurrence.

The decode hot loop (reference ``src/codec/decoder.rs:36-45``) is a strict
per-sample recurrence with O(1) state: 4 history + 4 weight int32 words per
(chunk, channel) lane. The XLA ``lax.scan`` version pays per-step loop
overhead that dwarfs the ~25 VPU ops of real work; this kernel instead:

- maps lanes (chunks x channels, padded to a multiple of 1024) onto the VPU
  as [8, 128] int32 tiles,
- keeps the 8 state planes in registers through an unrolled ``fori_loop``
  over the time block (the history shift becomes pure register renaming in
  the loop carry),
- streams the pre-gathered dequantized values through VMEM in [TB, 8, 128]
  blocks along a sequential time grid dimension, with the state parked in
  VMEM scratch between time blocks,
- parallelizes the lane-block grid dimension (megacore).

Inputs/outputs are time-major [T, R, 128]; the caller handles the
[N, F, C] <-> lane-major transposes and padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per grid step. Wider tiles amortize the fori_loop's per-iteration
# overhead (the dominant cost at [8, 128]: ~25 VPU ops of real work per
# step) across 4 registers per state plane; 32 sublanes keeps the 8 state
# planes at 32 vregs, inside the register file.
SUBLANES = 32
LANE_BLOCK = SUBLANES * 128


def _decode_kernel(lms_ref, dq_ref, out_ref, h_scratch, w_scratch, unroll=1):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = lms_ref[0:4]
        w_scratch[:] = lms_ref[4:8]

    tb = dq_ref.shape[0]

    i16_min = jnp.int32(-32768)
    i16_max = jnp.int32(32767)
    thirteen = jnp.int32(13)
    four = jnp.int32(4)

    def body(s, carry):
        h0, h1, h2, h3, w0, w1, w2, w3 = carry
        dq = dq_ref[s].astype(jnp.int32)  # int16 stream (half the VMEM/HBM)
        pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> thirteen
        recon = jnp.minimum(jnp.maximum(pred + dq, i16_min), i16_max)
        out_ref[s] = recon.astype(jnp.int16)  # clamped: exact, half the HBM
        delta = dq >> four
        w0 = w0 + jnp.where(h0 < 0, -delta, delta)
        w1 = w1 + jnp.where(h1 < 0, -delta, delta)
        w2 = w2 + jnp.where(h2 < 0, -delta, delta)
        w3 = w3 + jnp.where(h3 < 0, -delta, delta)
        # history shift-append is pure register renaming in the carry
        return (h1, h2, h3, recon, w0, w1, w2, w3)

    carry0 = (
        h_scratch[0],
        h_scratch[1],
        h_scratch[2],
        h_scratch[3],
        w_scratch[0],
        w_scratch[1],
        w_scratch[2],
        w_scratch[3],
    )
    # int32 bounds: with jax_enable_x64 a plain Python int would make the
    # loop index i64, which Mosaic cannot legalize. unroll needs static
    # Python bounds; measured no win (the kernel is prolog-bound), kept for
    # tuning experiments.
    if unroll > 1:
        carry = jax.lax.fori_loop(0, tb, body, carry0, unroll=unroll)
    else:
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(tb), body, carry0)
    for i in range(4):
        h_scratch[i] = carry[i]
        w_scratch[i] = carry[4 + i]


@partial(jax.jit, static_argnames=("time_block", "sublanes", "unroll"))
def lms_decode_lanes(
    dq: jnp.ndarray,  # int16/int32[T, R, 128], T % time_block == 0, R % sublanes == 0
    lms: jnp.ndarray,  # int32[8, R, 128]: planes h0..h3, w0..w3
    time_block: int = 512,
    sublanes: int = SUBLANES,
    unroll: int = 1,
) -> jnp.ndarray:  # int16[T, R, 128] reconstructed samples
    t, r, _ = dq.shape
    s = sublanes
    assert t % time_block == 0 and r % s == 0
    grid = (r // s, t // time_block)
    return pl.pallas_call(
        partial(_decode_kernel, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((t, r, 128), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s, 128), lambda l, tt: (l * 0, l, l * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, s, 128), lambda l, tt: (tt, l, tt * 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (time_block, s, 128), lambda l, tt: (tt, l, tt * 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, s, 128), jnp.int32),
            pltpu.VMEM((4, s, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(lms, dq)


def decode_scan_pallas_lanes(
    dq_l: jnp.ndarray,  # int16[F, B] dequantized values, lane-major
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    n: int,
    c: int,
    interpret: bool = False,
) -> jnp.ndarray:  # int16[N, F, C]
    """Pad the lane-major inputs, run the kernel, un-pad, restore [N, F, C].

    Taking dq already lane-major lets the caller compute the dequantization
    in that layout (transposing the 1-byte codes instead of the 4-byte dq)."""
    f, b = dq_l.shape
    assert b == n * c
    # wide lane tiles for big batches; narrow for small ones (less padding).
    # int16 blocks with 8 sublanes are accepted by Mosaic and verified on
    # real v5e (bench mono/8ch round trips and the CLI drives exercise this
    # small-batch path with the int16 dq/out streams).
    s_sub = SUBLANES if b > 2048 else 8
    lane_block = s_sub * 128
    b_pad = -(-b // lane_block) * lane_block
    # keep tb * s_sub * 128B (x2 for in+out, x2 double-buffered) inside VMEM
    tb_max = 4096 // s_sub
    tb = 0
    for cand in (512, 256, 128):
        if cand <= tb_max and f % cand == 0:
            tb = cand
            break
    if tb == 0:
        tb = min(128, tb_max)
        f_pad = -(-f // tb) * tb
    else:
        f_pad = f

    if (f_pad, b_pad) != (f, b):
        dq_l = jnp.zeros((f_pad, b_pad), dtype=dq_l.dtype).at[:f, :b].set(dq_l)
    lms_l = jnp.zeros((8, b_pad), dtype=jnp.int32)
    state = jnp.concatenate([hist0, wts0], axis=-1)  # [N, C, 8]
    lms_l = lms_l.at[:, :b].set(state.reshape(b, 8).T)

    r = b_pad // 128
    if interpret:
        out = _lms_decode_lanes_interpret(
            dq_l.reshape(f_pad, r, 128), lms_l.reshape(8, r, 128),
            time_block=tb, sublanes=s_sub,
        )
    else:
        out = lms_decode_lanes(
            dq_l.reshape(f_pad, r, 128), lms_l.reshape(8, r, 128),
            time_block=tb, sublanes=s_sub,
        )
    out = out.reshape(f_pad, b_pad)[:f, :b]  # already int16 from the kernel
    return out.reshape(f, n, c).transpose(1, 0, 2)


def decode_scan_pallas(
    dq: jnp.ndarray,  # int16[N, F, C] pre-gathered dequantized values
    hist0: jnp.ndarray,  # int32[N, C, 4]
    wts0: jnp.ndarray,  # int32[N, C, 4]
    interpret: bool = False,
) -> jnp.ndarray:  # int16[N, F, C]
    n, f, c = dq.shape
    dq_l = dq.transpose(1, 0, 2).reshape(f, n * c)
    return decode_scan_pallas_lanes(dq_l, hist0, wts0, n, c, interpret=interpret)


def _lms_decode_lanes_interpret(dq, lms, time_block, sublanes=8):
    """Interpreter-mode variant for CPU tests."""
    t, r, _ = dq.shape
    s = sublanes
    grid = (r // s, t // time_block)
    return pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((t, r, 128), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s, 128), lambda l, tt: (l * 0, l, l * 0)),
            pl.BlockSpec((time_block, s, 128), lambda l, tt: (tt, l, tt * 0)),
        ],
        out_specs=pl.BlockSpec((time_block, s, 128), lambda l, tt: (tt, l, tt * 0)),
        scratch_shapes=[
            pltpu.VMEM((4, s, 128), jnp.int32),
            pltpu.VMEM((4, s, 128), jnp.int32),
        ],
        interpret=True,
    )(lms, dq)
