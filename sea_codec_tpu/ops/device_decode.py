"""Batched chunk decoding on device (JAX).

The SEA format makes chunk decode embarrassingly parallel: every chunk
carries its own per-channel LMS entry state (reference ``README.md:99-102``,
``src/codec/chunk.rs:95-103``), so a batch of N chunks decodes as one
``lax.scan`` over frames with all chunks x channels vectorized in the batch
dimensions. Per-sample semantics mirror the reference decoder hot loop
(``src/codec/decoder.rs:20-86``): predict -> dequantize (table lookup) ->
clamp -> LMS update.

Design notes (TPU):
- The dequantized values depend only on (residual_size, scale_factor, code),
  none of which depend on the LMS recurrence -- so the table gather is hoisted
  *out* of the scan and fully vectorized; the scan body is pure int32
  element-wise math over [N, C] lanes.
- Residual size is data (uint8 per window), so one compiled kernel serves
  CBR, VBR, and any mix of chunk configurations with the same shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lms


@partial(jax.jit, static_argnames=("scale_factor_frames",))
def decode_chunks(
    codes: jnp.ndarray,  # uint8[N, F, C] quantized residual codes
    sf_codes: jnp.ndarray,  # uint8[N, W, C] scale factors per window
    rs: jnp.ndarray,  # uint8[N, W, C] residual sizes per window (1..8)
    hist0: jnp.ndarray,  # int32[N, C, 4] chunk-entry LMS history
    wts0: jnp.ndarray,  # int32[N, C, 4] chunk-entry LMS weights
    dqt_flat: jnp.ndarray,  # int32[8 * n_sf * 256] stacked dequant table
    scale_factor_frames: int,
) -> jnp.ndarray:
    """Decode a batch of chunks -> int16[N, F, C]."""
    n, f, c = codes.shape
    w = sf_codes.shape[1]
    n_sf = dqt_flat.shape[0] // (8 * 256)
    assert w * scale_factor_frames >= f

    # Per-frame scale factor / residual size: repeat each window sff times.
    reps = scale_factor_frames
    sf_pf = jnp.repeat(sf_codes, reps, axis=1, total_repeat_length=w * reps)[:, :f]
    rs_pf = jnp.repeat(rs, reps, axis=1, total_repeat_length=w * reps)[:, :f]

    # Hoisted dequantization gather: [N, F, C] int32.
    idx = (
        (rs_pf.astype(jnp.int32) - 1) * n_sf + sf_pf.astype(jnp.int32)
    ) * 256 + codes.astype(jnp.int32)
    dq = jnp.take(dqt_flat, idx)

    def step(carry, dq_t):
        hist, wts = carry
        pred = lms.predict(hist, wts)  # [N, C]
        recon = lms.clamp_i16(pred + dq_t)
        hist, wts = lms.update(hist, wts, recon, dq_t)
        return (hist, wts), recon.astype(jnp.int16)

    dq_scan = jnp.moveaxis(dq, 1, 0)  # [F, N, C]
    (_, _), recon = jax.lax.scan(step, (hist0, wts0), dq_scan)
    return jnp.moveaxis(recon, 0, 1)  # [N, F, C]
