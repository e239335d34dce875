"""Device-side chunk serialization (CBR).

The corpus encoder's output transfer was dominated by *unpacked* residual
codes (one byte per sample) plus a host-side ``np.packbits`` pass
(reference serialization: ``src/codec/chunk.rs:215-278``). Packing on the
TPU shrinks the device->host transfer to the actual bitstream size
(~rs/8 bytes per sample) and removes the host pack entirely: the device
emits finished ``uint8[chunk_size]`` container rows that the host merely
concatenates with the file header.

Everything here is plain XLA (shift/mask bit expansion + an 8-wide fold),
so it fuses into the encoder program and runs on any backend. Bit layout
matches ``ops.bitpack`` exactly (MSB-first, final partial byte
left-aligned), which in turn matches the reference ``BitPacker``
(``src/codec/bits.rs:104-134``).

VBR rows have data-dependent per-item widths and keep the host pack
(``batch.serialize_full_chunks``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CHUNK_TYPE_CBR = 0x01


def pack_bits_rows_device(values: jnp.ndarray, width: int) -> jnp.ndarray:
    """Pack each row of ``values`` [R, N] (items < 2^width) into a MSB-first
    bitstream -> uint8[R, ceil(N*width/8)]. Device mirror of
    ``bitpack.pack_bits_rows`` for constant widths.

    Closed form via the stream's periodicity (the inverse of
    ``device_decode.unpack_const_strided``): a w-bit stream repeats every
    lcm(w, 8) bits = p bytes carrying g codes, and byte k of each period is
    a FIXED shift/or combination of <= 2 codes. The previous formulation
    materialized the per-code bit plane as int32 (32x the payload in HBM)
    and measured 9 ms of the 14 ms corpus-encode block
    (scripts/perf_encode_attribution.py)."""
    import math

    r, n = values.shape
    total = n * width
    nbytes = -(-total // 8)
    w_lcm = (width * 8) // math.gcd(width, 8)
    p = w_lcm // 8  # bytes per period
    g = w_lcm // width  # codes per period
    groups = -(-n // g)
    # mask to width bits: the bit-plane formulation silently truncated
    # out-of-range values; the shift/or combination would smear their high
    # bits into the neighboring code's byte
    v = values.astype(jnp.int32) & ((1 << width) - 1)
    if groups * g != n:
        v = jnp.pad(v, ((0, 0), (0, groups * g - n)))
    v = v.reshape(r, groups, g)
    byts = []
    for k in range(p):
        acc = None
        for j in range(8 * k // width, (8 * k + 7) // width + 1):
            sh = (8 * k + 8) - (j + 1) * width  # code j LSB above byte k LSB
            contrib = v[:, :, j] << sh if sh >= 0 else v[:, :, j] >> -sh
            acc = contrib if acc is None else acc | contrib
        byts.append(acc & 0xFF)
    out = jnp.stack(byts, axis=2).reshape(r, groups * p)[:, :nbytes]
    return out.astype(jnp.uint8)


def lms_section_device(ehist: jnp.ndarray, ewts: jnp.ndarray) -> jnp.ndarray:
    """Per-chunk LMS header bytes: history then weights, each i16 LE with
    i32 -> low-16-bits truncation (reference ``lms.rs:64-78``).
    ehist/ewts int32[R, C, 4] -> uint8[R, C*16]."""
    lms = jnp.concatenate([ehist, ewts], axis=2).astype(jnp.int32)  # [R, C, 8]
    lo = lms & 0xFF
    hi = (lms >> 8) & 0xFF
    byts = jnp.stack([lo, hi], axis=-1).reshape(lms.shape[0], -1)
    return byts.astype(jnp.uint8)


def cbr_chunk_size(
    channels: int, frames: int, scale_factor_bits: int, scale_factor_frames: int,
    residual_size: int,
) -> int:
    """Serialized byte length of a CBR chunk with ``frames`` frames."""
    w = -(-frames // scale_factor_frames)
    sf_bytes = -(-(w * channels * scale_factor_bits) // 8)
    res_bytes = -(-(frames * channels * residual_size) // 8)
    return 4 + 16 * channels + sf_bytes + res_bytes


def serialize_chunks_cbr_device(
    sf: jnp.ndarray,  # uint8[R, W, C]
    codes: jnp.ndarray,  # uint8[R, F, C]
    ehist: jnp.ndarray,  # int32[R, C, 4]
    ewts: jnp.ndarray,  # int32[R, C, 4]
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
) -> jnp.ndarray:
    """Full CBR chunks -> finished container rows uint8[R, chunk_size].

    Byte-identical to ``batch.serialize_full_chunks`` (CBR): 4-byte chunk
    header, per-channel LMS state, packed scale factors, packed residuals
    (``src/codec/chunk.rs:215-278`` layout).
    """
    r, w, c = sf.shape
    f = codes.shape[1]
    head = jnp.broadcast_to(
        jnp.array(
            [
                CHUNK_TYPE_CBR,
                ((scale_factor_bits << 4) | residual_size) & 0xFF,
                scale_factor_frames,
                0x5A,
            ],
            dtype=jnp.uint8,
        )[None, :],
        (r, 4),
    )
    parts = [
        head,
        lms_section_device(ehist, ewts),
        pack_bits_rows_device(sf.reshape(r, w * c), scale_factor_bits),
        pack_bits_rows_device(codes.reshape(r, f * c), residual_size),
    ]
    return jnp.concatenate(parts, axis=1)


def corpus_rows_cbr_device(
    sf: jnp.ndarray,  # uint8[NC, W, B] lane-packed (B = n_files * C)
    codes: jnp.ndarray,  # uint8[NC, F, B]
    ehist: jnp.ndarray,  # int32[NC, B, 4]
    ewts: jnp.ndarray,  # int32[NC, B, 4]
    n_files: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
) -> jnp.ndarray:
    """Lane-packed corpus encoder outputs -> per-file container rows
    uint8[n_files, NC, chunk_size]."""
    nc, w, b = sf.shape
    f = codes.shape[1]
    nf = n_files
    c = b // nf
    sf_r = sf.reshape(nc, w, nf, c).transpose(2, 0, 1, 3).reshape(nf * nc, w, c)
    codes_r = (
        codes.reshape(nc, f, nf, c).transpose(2, 0, 1, 3).reshape(nf * nc, f, c)
    )
    eh_r = ehist.reshape(nc, nf, c, 4).transpose(1, 0, 2, 3).reshape(nf * nc, c, 4)
    ew_r = ewts.reshape(nc, nf, c, 4).transpose(1, 0, 2, 3).reshape(nf * nc, c, 4)
    rows = serialize_chunks_cbr_device(
        sf_r, codes_r, eh_r, ew_r,
        scale_factor_bits, scale_factor_frames, residual_size,
    )
    return rows.reshape(nf, nc, -1)


serialize_chunks_cbr = jax.jit(
    serialize_chunks_cbr_device,
    static_argnames=("scale_factor_bits", "scale_factor_frames", "residual_size"),
)
