"""Device-side parsing of full CBR chunk rows (the serialize_device inverse).

A full CBR chunk's layout is entirely static — 4-byte header, per-channel
LMS entry state, bit-packed scale factors, bit-packed residuals at fixed
offsets (reference ``src/codec/chunk.rs:69-213``) — so a batch of
``uint8[N, chunk_size]`` container rows parses into the decoder's inputs
with static slices, the gather-free constant-width unpack, and in-register
i16 sign extension. No host round trip: together with
``serialize_device.serialize_chunks_cbr_device`` this closes the
encode → bytes → decode pipeline entirely on device
(``transcode_chunks_cbr_device``).

VBR full-chunk rows parse on device too (``parse_chunks_vbr_device``):
every *section offset* is static — only the residual bitstream's internal
layout is data-dependent, and that is the decoder's job
(``chunk.rs:126-142``: the 2-bit size deltas are a constant-width section).
Only VBR *serialization* stays on the host (data-dependent pack widths,
``batch.serialize_full_chunks``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .device_decode import decode_chunks_packed_fn, unpack_const_strided


def parse_chunks_cbr_device(
    rows: jnp.ndarray,  # uint8[N, chunk_size] full CBR container rows
    channels: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
    frames: int,
):
    """Rows -> (res_bytes, sf_codes, rs, hist, wts), the
    ``decode_chunks_packed`` input tuple. Byte semantics match the host
    parser exactly, including the i32 -> i16 -> i32 LMS truncate/widen
    round trip (reference ``lms.rs:64-94``)."""
    n = rows.shape[0]
    c = channels
    w = -(-frames // scale_factor_frames)
    sf_bytes = -(-(w * c * scale_factor_bits) // 8)
    sf_off = 4 + 16 * c
    res_off = sf_off + sf_bytes

    # LMS section: history then weights, i16 LE, widened with sign extension
    lms_b = rows[:, 4:sf_off].reshape(n, c, 8, 2).astype(jnp.int32)
    lms16 = lms_b[..., 0] | (lms_b[..., 1] << 8)
    lms = (lms16 ^ 0x8000) - 0x8000
    hist, wts = lms[:, :, :4], lms[:, :, 4:]

    sf = (
        unpack_const_strided(rows[:, sf_off:res_off], scale_factor_bits, w * c)
        .reshape(n, w, c)
    )
    rs = jnp.full((n, w, c), residual_size, jnp.uint8)
    return rows[:, res_off:], sf, rs, hist, wts


@partial(
    jax.jit,
    static_argnames=(
        "channels",
        "scale_factor_bits",
        "scale_factor_frames",
        "residual_size",
        "frames",
        "use_pallas",
        "pallas_interpret",
        "fused",
    ),
)
def transcode_chunks_cbr_device(
    rows: jnp.ndarray,  # uint8[N, chunk_size] full CBR container rows
    channels: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
    frames: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    fused: bool = True,
) -> jnp.ndarray:  # int16[N, frames, channels]
    """Decode finished container rows without leaving the device: the
    composition ``decode(parse(rows))``, jitted as one program so the
    parsed sections never materialize in HBM beyond what fusion keeps."""
    parsed = parse_chunks_cbr_device(
        rows, channels, scale_factor_bits, scale_factor_frames,
        residual_size, frames,
    )
    dqt_flat = jnp.asarray(
        tables.dqt_stacked(scale_factor_bits).reshape(-1), jnp.int32
    )
    return decode_chunks_packed_fn(
        *parsed, dqt_flat,
        scale_factor_frames=scale_factor_frames,
        frames=frames,
        residual_size=residual_size,
        use_pallas=use_pallas,
        pallas_interpret=pallas_interpret,
        fused=fused,
    )


def parse_chunks_vbr_device(
    rows: jnp.ndarray,  # uint8[N, chunk_size] full VBR container rows
    channels: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,  # the chunk header's base size (floor(residual_bits))
    frames: int,
):
    """VBR rows -> (res_bytes, sf_codes, rs, hist, wts). The per-window
    residual sizes come from the constant-width 2-bit delta section:
    ``rs = delta + residual_size - 1`` (reference ``chunk.rs:136-139``)."""
    n = rows.shape[0]
    c = channels
    w = -(-frames // scale_factor_frames)
    sf_bytes = -(-(w * c * scale_factor_bits) // 8)
    vbr_bytes = -(-(w * c * 2) // 8)
    sf_off = 4 + 16 * c
    vbr_off = sf_off + sf_bytes
    res_off = vbr_off + vbr_bytes

    lms_b = rows[:, 4:sf_off].reshape(n, c, 8, 2).astype(jnp.int32)
    lms16 = lms_b[..., 0] | (lms_b[..., 1] << 8)
    lms = (lms16 ^ 0x8000) - 0x8000
    hist, wts = lms[:, :, :4], lms[:, :, 4:]

    sf = (
        unpack_const_strided(rows[:, sf_off:vbr_off], scale_factor_bits, w * c)
        .reshape(n, w, c)
    )
    deltas = unpack_const_strided(rows[:, vbr_off:res_off], 2, w * c)
    rs = (deltas.astype(jnp.int32) + (residual_size - 1)).astype(jnp.uint8)
    return rows[:, res_off:], sf, rs.reshape(n, w, c), hist, wts


@partial(
    jax.jit,
    static_argnames=(
        "channels",
        "scale_factor_bits",
        "scale_factor_frames",
        "residual_size",
        "frames",
        "max_code_bits",
        "use_pallas",
        "pallas_interpret",
        "fused",
    ),
)
def decode_rows_vbr_device(
    rows: jnp.ndarray,  # uint8[N, chunk_size] full VBR container rows
    channels: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
    frames: int,
    max_code_bits: int = 8,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    fused: bool = True,
) -> jnp.ndarray:  # int16[N, frames, channels]
    """VBR decode straight from container rows, parse included on device."""
    parsed = parse_chunks_vbr_device(
        rows, channels, scale_factor_bits, scale_factor_frames,
        residual_size, frames,
    )
    dqt_flat = jnp.asarray(
        tables.dqt_stacked(scale_factor_bits).reshape(-1), jnp.int32
    )
    return decode_chunks_packed_fn(
        *parsed, dqt_flat,
        scale_factor_frames=scale_factor_frames,
        frames=frames,
        residual_size=0,  # VBR: widths come from the parsed rs
        use_pallas=use_pallas,
        pallas_interpret=pallas_interpret,
        max_code_bits=max_code_bits,
        fused=fused,
    )


def _np_parse_reference(rows: np.ndarray, header, frames: int):
    """Host oracle for tests: parse via the production host path."""
    from ..batch import parse_full_chunks

    return parse_full_chunks(rows, header)
