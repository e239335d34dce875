"""The 4-tap sign-sign LMS predictor as JAX array functions.

Semantics are the reference's exactly (``src/codec/lms.rs``):

- ``predict`` = (sum_i w_i * h_i) >> 13, with *wrapping* int32 products and
  sum (the reference is Rust release-mode arithmetic).
- ``update``: delta = dequantized >> 4; w_i += sign(h_i)*delta (h_i >= 0 gets
  +delta); history shifts left and appends the reconstructed sample.
- ``weights_penalty`` = max((sum_i w_i^2 >> 18) - 0x8ff, 0)^2 in 64-bit.

All functions operate on arrays whose last axis is the 4 taps; any leading
batch axes (chunks, channels, scale-factor candidates) broadcast through.
Initial state for an encoder stream: zero history, weights [0,0,-2^13,2^14]
(reference src/codec/lms.rs:19-32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .tables import FLOATING_BITS, LMS_LEN

I16_MIN = -32768
I16_MAX = 32767


def initial_weights(channels: int) -> np.ndarray:
    """int32[channels, 4] initial encoder weights (reference lms.rs:26-27)."""
    w = np.zeros((channels, LMS_LEN), dtype=np.int32)
    w[:, LMS_LEN - 2] = -(1 << (16 - FLOATING_BITS))  # -2^13
    w[:, LMS_LEN - 1] = 1 << (17 - FLOATING_BITS)  # 2^14
    return w


def initial_history(channels: int) -> np.ndarray:
    return np.zeros((channels, LMS_LEN), dtype=np.int32)


def predict(history: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] x [..., 4] -> [...]; wrapping int32 dot then >> 13."""
    prod = weights * history  # int32 wrap
    s = jnp.sum(prod, axis=-1, dtype=jnp.int32)  # keep int32: wrap like Rust
    return s >> (16 - FLOATING_BITS)


def clamp_i16(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(v, I16_MIN, I16_MAX)


def update(
    history: jnp.ndarray,
    weights: jnp.ndarray,
    reconstructed: jnp.ndarray,
    dequantized: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One LMS update step. ``reconstructed``/``dequantized`` are [...]."""
    delta = dequantized >> (FLOATING_BITS + 1)
    step = jnp.where(history < 0, -delta[..., None], delta[..., None])
    new_weights = weights + step  # int32 wrap
    new_history = jnp.concatenate(
        [history[..., 1:], reconstructed[..., None].astype(jnp.int32)], axis=-1
    )
    return new_history, new_weights


def weights_penalty(weights: jnp.ndarray) -> jnp.ndarray:
    """uint64 rank penalty of the *current* weights (reference lms.rs:53-62)."""
    w64 = weights.astype(jnp.int64)
    s = jnp.sum(w64 * w64, axis=-1, dtype=jnp.int64)
    p = jnp.maximum((s >> 18) - 0x8FF, 0).astype(jnp.uint64)
    return p * p
