"""Ahead-of-time export of the device decoder (serving artifacts).

``jax.export`` serializes a compiled-shape codec program (StableHLO +
calling convention) to bytes that a serving system loads and runs WITHOUT
tracing Python codec code — the TPU analog of shipping the reference's
compiled decoder library (``c/sea.h`` exists so consumers don't need the
Rust toolchain; these artifacts exist so consumers don't need this
package's trace path, only jax).

The exported program is the rows decoder: ``uint8[N, chunk_size]`` full
container rows -> ``int16[N, frames, C]`` PCM, parse included on device
(``ops/parse_device.py``). Shapes are static per artifact — a serving tier
exports one artifact per stream geometry it accepts (the chunk geometry is
in the file header, so dispatch is a dict lookup).

Example:
    blob = export_rows_decoder(n_chunks=256, channels=2)
    Path("decoder_cbr3_stereo.jaxexport").write_bytes(blob)
    # ... in the serving process:
    decode = load_rows_decoder(blob)
    pcm = decode(rows)  # jax array in, jax array out
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_rows_decoder(
    n_chunks: int,
    channels: int,
    frames_per_chunk: int = 5120,
    scale_factor_frames: int = 20,
    scale_factor_bits: int = 4,
    residual_size: int = 3,
    vbr: bool = False,
    max_code_bits: int = 8,
    chunk_size: int | None = None,
    use_pallas: bool | None = None,
    platforms: list[str] | None = None,
) -> bytes:
    """Serialize a rows->PCM decoder for one stream geometry.

    ``residual_size``: CBR constant width, or (vbr=True) the chunk header's
    base size. ``chunk_size``: the header's chunk byte length — computed
    for CBR when omitted; REQUIRED for VBR (the per-chunk size multiset is
    constant per stream geometry+target, so it lives in the file header,
    not in a closed form here). ``use_pallas`` defaults to True on a TPU
    backend. ``platforms`` pins the artifact's lowering platforms
    (default: the current backend).
    """
    from .ops.parse_device import decode_rows_vbr_device, transcode_chunks_cbr_device
    from .ops.serialize_device import cbr_chunk_size

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    c = channels
    if vbr:
        if chunk_size is None:
            raise ValueError("VBR export requires the header's chunk_size")

        def fn(rows):
            return decode_rows_vbr_device(
                rows, c, scale_factor_bits=scale_factor_bits,
                scale_factor_frames=scale_factor_frames,
                residual_size=residual_size, frames=frames_per_chunk,
                max_code_bits=max_code_bits, use_pallas=use_pallas,
            )
    else:
        if chunk_size is None:
            chunk_size = cbr_chunk_size(
                c, frames_per_chunk, scale_factor_bits, scale_factor_frames,
                residual_size,
            )

        def fn(rows):
            return transcode_chunks_cbr_device(
                rows, c, scale_factor_bits=scale_factor_bits,
                scale_factor_frames=scale_factor_frames,
                residual_size=residual_size, frames=frames_per_chunk,
                use_pallas=use_pallas,
            )

    spec = jax.ShapeDtypeStruct((n_chunks, chunk_size), jnp.uint8)
    exp = jax_export.export(
        jax.jit(fn), platforms=platforms
    )(spec)
    return bytes(exp.serialize())


def load_rows_decoder(blob: bytes):
    """Deserialize an exported decoder into a callable (rows -> PCM)."""
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)
