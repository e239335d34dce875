"""Batch (rectangular) decode pipeline -- the performance path.

A ``.sea`` file is a fixed-size-chunk container, so every full chunk of a
file has an *identical* byte layout: the same header offsets, the same
scale-factor section length, the same residual region. The host does only
cheap slicing (LMS i16 views, small scale-factor/VBR-size unpacks); the
packed residual bytes -- the bulk of the data -- go to the device untouched,
where a vectorized bit-expansion + gather kernel unpacks them and the batched
``lax.scan`` LMS recurrence decodes all chunks x channels in parallel
(``ops.device_decode.decode_chunks_packed``). The ragged final chunk (if any)
is parsed and decoded separately, exactly like the session decoder.

This is the TPU-native analog of the reference's sequential chunk-at-a-time
decode loop (``src/decoder.rs``, ``src/codec/file.rs``): identical output,
massively parallel execution.
"""

from __future__ import annotations

import io

import jax.numpy as jnp
import numpy as np

from .api import SeaDecodeInfo
from .container import (
    CHUNK_TYPE_CBR,
    CHUNK_TYPE_VBR,
    SeaChunk,
    SeaFileHeader,
    scale_factor_items,
)
from .models.decoder import DecoderModel
from .ops import bitpack, tables
from .ops.device_decode import (
    batch_max_code_bits as _max_code_bits,
    decode_chunks_packed,
    default_use_pallas,
)
from .utils.errors import SeaInvalidFrame

# Optional pipeline attribution: when a caller (bench.py, --stats) installs a
# ``StageTimes`` here, the corpus pipelines record where wall-clock goes --
# ``encode_stage``/``decode_parse`` (host CPU: staging, container parse),
# ``encode_put``/``decode_put`` (host->device upload), ``encode_fetch``/
# ``decode_fetch`` (device_get wall: device compute not yet drained + the
# device->host download), ``encode_assemble``/``decode_assemble`` (host CPU:
# container serialize / PCM reassembly), and ``encode_wall``/``decode_wall``
# (the whole pipeline call). Components overlap across threads (the pipeline
# exists to overlap them), so their sum exceeds the wall time; each number is
# the direct wall-clock of its section. None (the default) = zero overhead.
PIPELINE_TIMES = None


def _pt(name: str):
    """stage_timer into PIPELINE_TIMES, or a no-op when attribution is off."""
    t = PIPELINE_TIMES
    if t is None:
        import contextlib

        return contextlib.nullcontext()
    from .utils.profiling import stage_timer

    return stage_timer(t, name)


class ParsedBatch:
    """Host-parsed arrays for the full chunks of one file."""

    def __init__(self, res_bytes, sf, rs, hist, wts, sfb, sff, residual_size, chunk_type):
        self.res_bytes = res_bytes  # uint8[N, B] packed residual section
        self.sf = sf  # uint8[N, W, C]
        self.rs = rs  # uint8[N, W, C]
        self.hist = hist  # int32[N, C, 4]
        self.wts = wts  # int32[N, C, 4]
        self.scale_factor_bits = sfb
        self.scale_factor_frames = sff
        self.residual_size = residual_size  # constant width for CBR, 0 for VBR
        self.chunk_type = chunk_type


def parse_full_chunks(body: np.ndarray, header: SeaFileHeader) -> ParsedBatch:
    """Parse [N, chunk_size] full-chunk bytes; residuals stay packed."""
    n = body.shape[0]
    c = header.channels
    fpc = header.frames_per_chunk

    chunk_type = int(body[0, 0])
    if chunk_type not in (CHUNK_TYPE_CBR, CHUNK_TYPE_VBR):
        raise SeaInvalidFrame(f"bad chunk type {chunk_type:#x}")
    if not (
        np.all(body[:, 0] == chunk_type)
        and np.all(body[:, 1] == body[0, 1])
        and np.all(body[:, 2] == body[0, 2])
    ):
        raise SeaInvalidFrame("heterogeneous chunk configs in one file")
    sfb = int(body[0, 1]) >> 4
    residual_size = int(body[0, 1]) & 0x0F
    sff = int(body[0, 2])
    if not 1 <= sfb <= 8 or not 1 <= residual_size <= 8 or sff == 0:
        raise SeaInvalidFrame("bad chunk config")

    pos = 4
    lms_bytes = c * 16
    # corrupt headers can declare a chunk_size smaller than the sections the
    # chunk config implies; a clipped slice would crash the reshape/view
    # below instead of rejecting (same checks as SeaChunk.from_bytes)
    if body.shape[1] < pos + lms_bytes:
        raise SeaInvalidFrame("chunk too short for LMS state")
    lms = (
        np.ascontiguousarray(body[:, pos : pos + lms_bytes])
        .view("<i2")
        .reshape(n, c, 8)
        .astype(np.int32)
    )
    hist, wts = lms[:, :, :4], lms[:, :, 4:]
    pos += lms_bytes

    w = -(-fpc // sff)
    sf_items = scale_factor_items(fpc, sff, c)
    sf_bytes = bitpack.packed_byte_len(sfb, sf_items)
    if body.shape[1] < pos + sf_bytes:
        raise SeaInvalidFrame("chunk too short for scale factors")
    sf = bitpack.unpack_bits_rows(body[:, pos : pos + sf_bytes], sfb, sf_items)
    sf = sf.reshape(n, w, c)
    pos += sf_bytes

    if chunk_type == CHUNK_TYPE_VBR:
        vbr_bytes = bitpack.packed_byte_len(2, sf_items)
        if body.shape[1] < pos + vbr_bytes:
            raise SeaInvalidFrame("chunk too short for vbr sizes")
        deltas = bitpack.unpack_bits_rows(body[:, pos : pos + vbr_bytes], 2, sf_items)
        rs = (deltas.astype(np.int32) + residual_size - 1).astype(np.uint8).reshape(n, w, c)
        pos += vbr_bytes
        if np.any((rs < 1) | (rs > 8)):
            raise SeaInvalidFrame("bad vbr residual size")
        # per-chunk residual bytes implied by the size table (full chunks:
        # every window has sff frames except a shorter last one)
        wframes = np.full(w, sff, dtype=np.int64)
        wframes[-1] = fpc - (w - 1) * sff
        res_need = -(-(rs.astype(np.int64) * wframes[None, :, None]).sum(axis=(1, 2)) // 8)
        if int(res_need.max(initial=0)) > body.shape[1] - pos:
            raise SeaInvalidFrame("chunk too short for residuals")
        res_bytes = np.ascontiguousarray(body[:, pos:])
        const_width = 0
    else:
        rs = np.full((n, w, c), residual_size, dtype=np.uint8)
        nbytes = bitpack.packed_byte_len(residual_size, fpc * c)
        if body.shape[1] < pos + nbytes:
            raise SeaInvalidFrame("chunk too short for residuals")
        res_bytes = np.ascontiguousarray(body[:, pos : pos + nbytes])
        const_width = residual_size

    return ParsedBatch(res_bytes, sf, rs, hist, wts, sfb, sff, const_width, chunk_type)


def split_chunks(encoded: bytes):
    """(header, full_chunk_bytes uint8[N, chunk_size] | None, tail bytes)."""
    reader = io.BytesIO(encoded)
    header = SeaFileHeader.from_reader(reader)
    body = encoded[header.serialized_len :]
    cs = header.chunk_size
    fpc = header.frames_per_chunk
    total_frames = header.total_frames

    n_avail = len(body) // cs
    if total_frames > 0:
        # Only chunks holding exactly frames_per_chunk frames are "full";
        # a ragged final chunk can still occupy chunk_size bytes (and when a
        # file's FIRST chunk is ragged, chunk_size IS the ragged size), so
        # the rectangular path must be gated on frame count, not byte count.
        n_full = min(n_avail, total_frames // fpc)
        has_tail = total_frames % fpc != 0
    else:
        n_full = n_avail  # streaming: only whole chunks are decodable
        has_tail = False
    rect = None
    if n_full:
        rect = np.frombuffer(body[: n_full * cs], dtype=np.uint8).reshape(n_full, cs)
    tail = b""
    if has_tail:
        tail = body[n_full * cs :]
    return header, rect, tail


def parsed_concat(blobs):
    """Concatenate the full-chunk batches of same-config encoded files into
    one decode batch: ``(header, cfg, [res_bytes, sf, rs, hist, wts])`` with
    the arrays concatenated over chunks and ``cfg`` a ParsedBatch carrying
    the shared config fields. Files with no full chunks are skipped (their
    rectangular section is None). Shared by bench.py and the perf scripts so
    the diagnosed program geometry can't drift from the benched one."""
    header = None
    cfg = None
    fields: list[tuple] = []
    for enc in blobs:
        h, rect, _tail = split_chunks(enc)
        if rect is None:
            continue
        b = parse_full_chunks(rect, h)
        header = header or h
        cfg = cfg if cfg is not None else b
        fields.append((b.res_bytes, b.sf, b.rs, b.hist, b.wts))
    if not fields:
        raise SeaInvalidFrame("parsed_concat: no full chunks in any input")
    cat = [np.concatenate(p, axis=0) for p in zip(*fields)]
    return header, cfg, cat


def decode_sea(encoded: bytes, device_batch: int = 1024) -> SeaDecodeInfo:
    """Fast batched decode of a whole .sea stream (bit-identical to the
    session decoder, which mirrors the reference chunk loop)."""
    header, rect, tail = split_chunks(encoded)
    c = header.channels
    fpc = header.frames_per_chunk
    total_frames = header.total_frames

    parts: list[np.ndarray] = []
    if rect is not None:
        batch = parse_full_chunks(rect, header)
        dqt_flat = jnp.asarray(
            tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), dtype=jnp.int32
        )
        n = rect.shape[0]
        frames_real = np.full(n, fpc, dtype=np.int64)
        if total_frames > 0:
            frames_real = np.minimum(
                frames_real, total_frames - np.arange(n, dtype=np.int64) * fpc
            )
        # dispatch all device batches first (async), then fetch
        outs = []
        mcb = _max_code_bits(batch.rs, batch.residual_size)
        for start in range(0, n, device_batch):
            end = min(start + device_batch, n)
            outs.append(
                decode_chunks_packed(
                    jnp.asarray(batch.res_bytes[start:end]),
                    jnp.asarray(batch.sf[start:end]),
                    jnp.asarray(batch.rs[start:end]),
                    jnp.asarray(batch.hist[start:end]),
                    jnp.asarray(batch.wts[start:end]),
                    dqt_flat,
                    scale_factor_frames=batch.scale_factor_frames,
                    frames=fpc,
                    residual_size=batch.residual_size,
                    use_pallas=default_use_pallas(),
                    max_code_bits=mcb,
                )
            )
        for k, out in enumerate(outs):
            pcm = np.asarray(out)  # [B, fpc, C]
            start = k * device_batch
            end = start + pcm.shape[0]
            if frames_real[end - 1] == fpc:  # fast path: all chunks full
                parts.append(pcm.reshape(-1))
            else:
                parts.append(pcm[:-1].reshape(-1))
                parts.append(pcm[-1, : frames_real[end - 1]].reshape(-1))

    if tail:
        n_full = rect.shape[0] if rect is not None else 0
        remaining = total_frames - n_full * fpc if total_frames > 0 else None
        chunk = SeaChunk.from_bytes(tail, header, remaining)
        model = DecoderModel(c, chunk.scale_factor_bits)
        parts.append(model.decode_chunk(chunk, frames_padded=fpc))

    samples = (
        np.concatenate(parts) if parts else np.zeros(0, dtype=np.int16)
    )
    if total_frames > 0 and samples.shape[0] < total_frames * c:
        raise SeaInvalidFrame(
            f"stream truncated: decoded {samples.shape[0] // c} of "
            f"{total_frames} frames"
        )
    return SeaDecodeInfo(
        samples=samples, sample_rate=header.sample_rate, channels=header.channels
    )


def _check_chunk_size(n: int) -> None:
    if n > 0xFFFF:
        from .utils.errors import SeaInvalidParameters

        raise SeaInvalidParameters(
            "chunk serializes to more than 65535 bytes (u16 chunk_size field);"
            " reduce frames_per_chunk, channels, or bitrate"
        )


def serialize_full_chunks(
    sf: np.ndarray,  # uint8[nc, w, C]
    codes: np.ndarray,  # uint8[nc, fpc, C]
    sizes: np.ndarray | None,  # uint8[nc, w, C] absolute VBR sizes, or None
    ehist: np.ndarray,  # int32[nc, C, 4]
    ewts: np.ndarray,  # int32[nc, C, 4]
    scale_factor_bits: int,
    scale_factor_frames: int,
    residual_size: int,
) -> np.ndarray:
    """Vectorized serialization of full chunks -> uint8[nc, chunk_size].

    All full chunks share section lengths (for VBR too: the distribution
    counts are static per full chunk, so the residual bit total is constant),
    making the whole container body one rectangular pack. Bitpacking runs
    through the native C++ packer when available (rows shard across threads;
    the pure-numpy ``bitpack`` path is the fallback) -- this is the VBR hot
    path, since variable-width residuals cannot use the device serializer's
    static layouts.
    """
    from .native import available as native_available

    if native_available():
        from .native import native_pack_rows

        def pack_rows(values, widths):
            if np.isscalar(widths) or np.ndim(widths) == 0:
                total = int(widths) * values.shape[1]
            else:
                total = int(np.asarray(widths)[0].sum())
            return native_pack_rows(values, widths, (total + 7) // 8)
    else:
        pack_rows = bitpack.pack_bits_rows

    nc, w, c = sf.shape
    fpc = codes.shape[1]
    sff = scale_factor_frames
    head = np.tile(
        np.array(
            [
                CHUNK_TYPE_VBR if sizes is not None else CHUNK_TYPE_CBR,
                ((scale_factor_bits << 4) | residual_size) & 0xFF,
                sff,
                0x5A,
            ],
            dtype=np.uint8,
        ),
        (nc, 1),
    )
    lms = np.concatenate([ehist, ewts], axis=2).astype(np.int16)  # [nc, C, 8]
    lms_bytes = (
        np.ascontiguousarray(lms.astype("<i2")).reshape(nc, -1).view(np.uint8)
    )
    sf_packed = pack_rows(sf.reshape(nc, w * c), scale_factor_bits)
    parts = [head, lms_bytes, sf_packed]
    if sizes is not None:
        rel = (sizes.astype(np.int32) - residual_size + 1).astype(np.uint8)
        parts.append(pack_rows(rel.reshape(nc, w * c), 2))
        widths = np.repeat(sizes.astype(np.int64), sff, axis=1)[:, :fpc]
        parts.append(
            pack_rows(codes.reshape(nc, fpc * c), widths.reshape(nc, fpc * c))
        )
    else:
        parts.append(pack_rows(codes.reshape(nc, fpc * c), residual_size))
    return np.hstack(parts)


def encode_sea(
    samples: np.ndarray,
    sample_rate: int,
    channels: int,
    settings=None,
) -> bytes:
    """Whole-file fast encode: one compiled program for all full chunks
    (see ops.encode_file), host-side container assembly. Byte-identical to
    the session encoder / one-shot API."""
    import jax.numpy as jnp

    from .encoder import EncoderSettings, coerce_samples, validate_encode_params
    from .models.vbr import interpolate_distribution, normalized_vbr_bitrate
    from .ops import lms as lms_ops
    from .ops.device_decode import default_use_pallas
    from .ops.encode_file import encode_file_cbr, encode_file_vbr

    if settings is None:
        settings = EncoderSettings()
    samples = coerce_samples(samples)
    validate_encode_params(channels, settings, samples.shape[0] // max(channels, 1))
    c = channels
    fpc = settings.frames_per_chunk
    sff = settings.scale_factor_frames
    sfb = settings.scale_factor_bits
    frames = samples.shape[0] // c
    nc_full = frames // fpc
    use_pallas = default_use_pallas() and c <= 128 and sfb <= 7

    header = SeaFileHeader(
        version=1,
        channels=c,
        chunk_size=0,
        frames_per_chunk=fpc,
        sample_rate=sample_rate,
        total_frames=frames,
        metadata=settings.metadata,
    )
    residual_size = int(np.floor(settings.residual_bits))
    if settings.vbr:
        from .models.vbr import vbr_base

        target0 = normalized_vbr_bitrate(settings.residual_bits, fpc, sfb, sff)
        # anchor the VBR delta base (see models/vbr.py on the reference's
        # corrupt-stream bug for high-overhead configs)
        residual_size = min(residual_size, vbr_base(target0) + 1)

    hist = lms_ops.initial_history(c)
    wts = lms_ops.initial_weights(c)
    prev = np.zeros(c, dtype=np.int32)

    chunks: list[bytes] = []
    if nc_full:
        # int16 on the wire; widened on device (halves the upload)
        x = samples[: nc_full * fpc * c].reshape(nc_full, fpc, c)
        if settings.vbr:
            from .models.vbr import vbr_base

            target = normalized_vbr_bitrate(settings.residual_bits, fpc, sfb, sff)
            base = vbr_base(target)
            sortable = (fpc * c) // sff
            m1, _t, p1, p2 = interpolate_distribution(sortable, target)
            sf, codes, sizes, ehist, ewts, hist_j, wts_j, prev_j = encode_file_vbr(
                jnp.asarray(x),
                jnp.asarray(hist),
                jnp.asarray(wts),
                jnp.asarray(prev),
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                base=base,
                dist=(m1, p1, p2),
                use_pallas=use_pallas,
            )
            sizes_j = sizes
            # one bundled device->host transfer (the relay link pays per-call
            # latency; separate fetches would each cost an RPC round trip)
            import jax

            sf, codes, sizes, ehist, ewts, hist, wts, prev = jax.device_get(
                (sf, codes, sizes_j, ehist, ewts, hist_j, wts_j, prev_j)
            )
            w = -(-fpc // sff)
            rect = serialize_full_chunks(
                sf.reshape(nc_full, w, c),
                codes.reshape(nc_full, fpc, c),
                sizes.reshape(nc_full, w, c),
                ehist,
                ewts,
                scale_factor_bits=sfb,
                scale_factor_frames=sff,
                residual_size=residual_size,
            )
            chunks.extend(bytes(row) for row in rect)
        else:
            import jax

            from .ops.serialize_device import serialize_chunks_cbr

            sf, codes, ehist, ewts, hist_j, wts_j, prev_j = encode_file_cbr(
                jnp.asarray(x),
                jnp.asarray(hist),
                jnp.asarray(wts),
                jnp.asarray(prev),
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                residual_size=residual_size,
                use_pallas=use_pallas,
            )
            # container rows are packed on device: the fetch is the finished
            # bitstream (~residual_size/8 bytes per sample), not raw codes
            rows = serialize_chunks_cbr(
                sf, codes, ehist, ewts,
                scale_factor_bits=sfb,
                scale_factor_frames=sff,
                residual_size=residual_size,
            )
            rows_np, hist, wts, prev = jax.device_get(
                (rows, hist_j, wts_j, prev_j)
            )
            chunks.extend(bytes(row) for row in rows_np)

    # ragged tail chunk via the per-chunk model path, seeded with the carried
    # state (bit-identical to the session's final encode_frame)
    tail_frames = frames - nc_full * fpc
    if tail_frames:
        from .models import CbrEncoderModel, VbrEncoderModel

        model_cls = VbrEncoderModel if settings.vbr else CbrEncoderModel
        model = model_cls(
            channels=c,
            scale_factor_bits=sfb,
            scale_factor_frames=sff,
            residual_bits=settings.residual_bits,
            frames_per_chunk=fpc,
        )
        model.state.hist = hist.astype(np.int32)
        model.state.wts = wts.astype(np.int32)
        model.state.prev_sf = prev.astype(np.int32)
        ehist_t, ewts_t = model.lms_snapshot
        tail_samples = samples[nc_full * fpc * c : frames * c]
        enc = model.encode(tail_samples)
        chunk = SeaChunk(
            channels=c,
            frames_in_chunk=tail_frames,
            chunk_type=CHUNK_TYPE_VBR if settings.vbr else CHUNK_TYPE_CBR,
            scale_factor_bits=sfb,
            scale_factor_frames=sff,
            residual_size=residual_size,
            lms_history=ehist_t,
            lms_weights=ewts_t,
            scale_factors=enc.scale_factors,
            vbr_residual_sizes=enc.residual_bits,
            residuals=enc.residuals,
        )
        chunks.append(chunk.serialize())

    if chunks:
        _check_chunk_size(len(chunks[0]))
        header.chunk_size = len(chunks[0])
    return header.serialize() + b"".join(chunks)


def _encode_tails_vbr_batched(
    jobs, c, sfb, sff, fpc, residual_bits, use_pallas
) -> list[bytes]:
    """Encode many files' ragged VBR tail chunks in two lane-packed device
    calls per bucket (analyze + encode) instead of two per file.

    VBR size selection is data-dependent per tail (the sortable window count
    and the distribution depend on the tail's own length, reference
    ``encoder_vbr.rs:98-137``), so the fused corpus scan's static
    distribution cannot cover tails; instead pass-1 ranks come back to the
    host, the exact per-chunk chooser runs per tail, and pass 2 re-encodes
    with the assigned sizes. Bit-identical to the per-file model path, which
    cost two relay round trips per file. Lane buckets are fixed at
    128/256/512 so corpora of any size share compiled shapes.

    ``jobs``: list of (tail_samples int16[], hist int32[C,4], wts int32[C,4],
    prev int32[C]) seeded with the fused scan's carry. Returns serialized
    chunk bytes, in job order.
    """
    if not jobs:
        return []
    from .models.common import EncoderKernel
    from .models.vbr import VbrEncoderModel, vbr_base

    params = VbrEncoderModel(
        channels=c,
        scale_factor_bits=sfb,
        scale_factor_frames=sff,
        residual_bits=residual_bits,
        frames_per_chunk=fpc,
    )
    base = vbr_base(params.vbr_target_bitrate)
    wp = params.windows_per_chunk
    kernel = EncoderKernel(c, sfb, sff, use_pallas=use_pallas)
    out: list[bytes] = []
    max_jobs = max(1, 512 // c)
    for g0 in range(0, len(jobs), max_jobs):
        sub = jobs[g0 : g0 + max_jobs]
        lanes_n = len(sub) * c
        lane_w = 128
        while lane_w < lanes_n:
            lane_w *= 2
        x = np.zeros((wp * sff, lane_w), np.int32)
        nv = np.zeros((wp, lane_w), np.int32)
        rs1 = np.ones((wp, lane_w), np.int32)
        h0 = np.zeros((lane_w, 4), np.int32)
        w0 = np.zeros((lane_w, 4), np.int32)
        p0 = np.zeros((lane_w,), np.int32)
        fr_list = []
        for j, (samp, fh, fw, fp) in enumerate(sub):
            f = samp.shape[0] // c
            fr_list.append(f)
            sl = slice(j * c, (j + 1) * c)
            x[:f, sl] = np.asarray(samp).reshape(f, c).astype(np.int32)
            nv[:, sl] = np.clip(
                f - np.arange(wp, dtype=np.int32) * sff, 0, sff
            )[:, None]
            rs1[:, sl] = base + 1
            h0[sl], w0[sl], p0[sl] = fh, fw, fp
        # pass 1: analyze at base+1; LMS restored, prev_sf kept
        # (encoder_vbr.rs:139-171)
        _sf1, _c1, ranks, _h1, _w1, p1 = kernel.run_lanes(x, rs1, nv, h0, w0, p0)
        rs2 = np.ones((wp, lane_w), np.int32)
        sizes_list = []
        for j, f in enumerate(fr_list):
            w_real = -(-f // sff)
            sl = slice(j * c, (j + 1) * c)
            sizes = params._choose_residual_sizes(
                f * c, ranks[:w_real, sl].reshape(-1)
            )
            sizes_list.append(sizes)
            rs2[:w_real, sl] = sizes.reshape(w_real, c).astype(np.int32)
        sf2, codes2, _r2, _h2, _w2, _p2 = kernel.run_lanes(x, rs2, nv, h0, w0, p1)
        for j, ((samp, fh, fw, fp), f, sizes) in enumerate(
            zip(sub, fr_list, sizes_list)
        ):
            w_real = -(-f // sff)
            sl = slice(j * c, (j + 1) * c)
            out.append(
                SeaChunk(
                    channels=c,
                    frames_in_chunk=f,
                    chunk_type=CHUNK_TYPE_VBR,
                    scale_factor_bits=sfb,
                    scale_factor_frames=sff,
                    residual_size=params.chunk_residual_size,
                    lms_history=fh,
                    lms_weights=fw,
                    scale_factors=sf2[:w_real, sl].reshape(-1).astype(np.uint8),
                    vbr_residual_sizes=sizes,
                    residuals=codes2[:f, sl].reshape(-1).astype(np.uint8),
                ).serialize()
            )
    return out


def encode_corpus(
    files: list[np.ndarray],
    sample_rate: int,
    channels: int,
    settings=None,
    pipeline_depth: int = 4,
    mesh=None,
) -> list[bytes]:
    """Encode many files at once by packing their channel streams into the
    encoder kernel's 128 lanes (each stream keeps its own LMS carry and
    per-window length mask). All files share ``channels`` and ``settings``.
    Outputs are byte-identical to per-file ``encode_sea``.

    Pipelined: up to ``pipeline_depth`` lane groups are in flight at once
    (JAX dispatch is asynchronous), overlapping host staging/assembly with
    device compute and transfers in both directions.

    CBR: whole files (including ragged tails) ride the fused kernel scan and
    the container rows are serialized *on device* (the residual bitstream
    comes back packed -- ~8/residual_size times smaller). VBR: full chunks
    ride the fused scan with per-file on-device error ranking; rows are
    packed on host (data-dependent widths); each file's ragged tail chunk is
    encoded by the per-chunk model seeded with the carried state.

    ``mesh``: a ``jax.sharding.Mesh`` -- lane blocks shard across every mesh
    axis (independent streams, no collectives) and each device encodes its
    blocks; output bytes are identical to the single-device path. Without a
    mesh the kernel path requires a TPU backend and falls back to per-file
    encoding elsewhere.
    """
    from .encoder import EncoderSettings, coerce_samples, validate_encode_params

    if settings is None:
        settings = EncoderSettings()
    validate_encode_params(channels, settings)
    files = [coerce_samples(f) for f in files]
    from .ops.device_decode import default_use_pallas

    use_pallas = default_use_pallas()
    if channels > 128 or settings.scale_factor_bits > 7:
        # >128 channels exceeds one lane block; sfb=8 exceeds the Pallas
        # kernel's VMEM budget -- these API-edge configs go file-at-a-time.
        # Everything else rides the lane-packed path: on CPU the same
        # program runs with the XLA window kernel (use_pallas=False), so a
        # CPU user gets corpus batching too.
        return [encode_sea(f, sample_rate, channels, settings) for f in files]

    import jax
    from .models.vbr import interpolate_distribution, normalized_vbr_bitrate
    from .ops import lms as lms_ops
    from .ops.encode_file import (
        encode_corpus_cbr_packed_blocks,
        encode_corpus_vbr_nv_blocks,
    )

    c = channels
    fpc = settings.frames_per_chunk
    sff = settings.scale_factor_frames
    sfb = settings.scale_factor_bits
    residual_size = int(np.floor(settings.residual_bits))
    if settings.vbr:
        from .models.vbr import vbr_base

        target = normalized_vbr_bitrate(settings.residual_bits, fpc, sfb, sff)
        base = vbr_base(target)
        residual_size = min(residual_size, base + 1)  # delta anchor (models/vbr.py)
        sortable = (fpc * c) // sff
        m1, _t, p1, p2 = interpolate_distribution(sortable, target)
    group_size = max(1, 128 // c)

    results: list[bytes] = [b""] * len(files)

    def make_header(fr: int) -> SeaFileHeader:
        return SeaFileHeader(
            version=1,
            channels=c,
            chunk_size=0,
            frames_per_chunk=fpc,
            sample_rate=sample_rate,
            total_frames=fr,
            metadata=settings.metadata,
        )

    def tail_chunk_cbr(fk, eh, ew, sf_t, codes_t) -> bytes:
        w_real = -(-fk // sff)
        return SeaChunk(
            channels=c,
            frames_in_chunk=fk,
            chunk_type=CHUNK_TYPE_CBR,
            scale_factor_bits=sfb,
            scale_factor_frames=sff,
            residual_size=residual_size,
            lms_history=eh,
            lms_weights=ew,
            scale_factors=sf_t[:w_real].reshape(-1),
            residuals=codes_t[:fk].reshape(-1),
        ).serialize()


    def assemble_cbr(entry) -> None:
        metas, fut = entry
        rows, tail_sf, tail_codes, tail_eh, tail_ew, _fh, _fw, _fp = fut.result()
        with _pt("encode_assemble"):
            _assemble_cbr_host(metas, rows, tail_sf, tail_codes, tail_eh, tail_ew)

    def _assemble_cbr_host(metas, rows, tail_sf, tail_codes, tail_eh, tail_ew):
        for bi, (idxs, group, frames) in enumerate(metas):
            for j, (i, fr) in enumerate(zip(idxs, frames)):
                header = make_header(fr)
                nc_f_full = fr // fpc
                body_parts = []
                if nc_f_full:
                    body_parts.append(rows[bi, j, :nc_f_full].tobytes())
                if fr % fpc:
                    body_parts.append(
                        tail_chunk_cbr(
                            fr - nc_f_full * fpc,
                            tail_eh[bi, j], tail_ew[bi, j],
                            tail_sf[bi, j], tail_codes[bi, j],
                        )
                    )
                if body_parts:
                    first_len = (
                        rows.shape[3] if nc_f_full else len(body_parts[0])
                    )
                    _check_chunk_size(first_len)
                    header.chunk_size = first_len
                results[i] = header.serialize() + b"".join(body_parts)

    def assemble_vbr(entry) -> None:
        metas, fut = entry
        sf, codes, sizes, ehist, ewts, fhist, fwts, fprev = fut.result()
        with _pt("encode_assemble"):
            _assemble_vbr_host(metas, sf, codes, sizes, ehist, ewts, fhist, fwts, fprev)

    def _assemble_vbr_host(metas, sf, codes, sizes, ehist, ewts, fhist, fwts, fprev):
        # batch-encode every ragged tail in this super-call: two lane-packed
        # device calls per <=512-lane bucket instead of two per file
        jobs, job_files = [], []
        for bi, (idxs, group, frames) in enumerate(metas):
            for j, (i, fr) in enumerate(zip(idxs, frames)):
                if fr % fpc:
                    lanes = slice(j * c, (j + 1) * c)
                    k = fr // fpc
                    jobs.append((
                        group[j][k * fpc * c : fr * c],
                        fhist[bi][lanes].astype(np.int32),
                        fwts[bi][lanes].astype(np.int32),
                        fprev[bi][lanes].astype(np.int32),
                    ))
                    job_files.append(i)
        tail_chunks = dict(
            zip(
                job_files,
                _encode_tails_vbr_batched(
                    jobs, c, sfb, sff, fpc, settings.residual_bits, use_pallas
                ),
            )
        )
        for bi, (idxs, group, frames) in enumerate(metas):
            for j, (i, fr) in enumerate(zip(idxs, frames)):
                lanes = slice(j * c, (j + 1) * c)
                header = make_header(fr)
                chunks = []
                nc_f_full = fr // fpc
                if nc_f_full:
                    rect = serialize_full_chunks(
                        sf[bi, :nc_f_full, :, lanes],
                        codes[bi, :nc_f_full, :, lanes],
                        sizes[bi, :nc_f_full, :, lanes],
                        ehist[bi, :nc_f_full, lanes],
                        ewts[bi, :nc_f_full, lanes],
                        scale_factor_bits=sfb,
                        scale_factor_frames=sff,
                        residual_size=residual_size,
                    )
                    chunks.extend(bytes(row) for row in rect)
                if fr % fpc:
                    chunks.append(tail_chunks[i])
                if chunks:
                    _check_chunk_size(len(chunks[0]))
                    header.chunk_size = len(chunks[0])
                results[i] = header.serialize() + b"".join(chunks)

    assemble = assemble_vbr if settings.vbr else assemble_cbr

    # fetches run on a background thread: download of super-call k overlaps
    # the upload/dispatch of k+1 (the relay link is full-duplex) and the
    # host-side container assembly
    from concurrent.futures import ThreadPoolExecutor
    from collections import deque

    # Lane groups (<=128 lanes each) batch further into multi-block device
    # calls: on a relay-attached chip each put/execute/fetch round trip pays
    # tens of ms of RPC latency, so blocks_per_call groups share one round.
    # With a mesh, blocks shard across devices, so calls carry a multiple of
    # mesh.size blocks (padding blocks are all-zero lanes).
    blocks_per_call = 4
    mesh_size = 0
    if mesh is not None and mesh.size > 1:
        mesh_size = mesh.size
        blocks_per_call = max(blocks_per_call, mesh_size)
        blocks_per_call -= blocks_per_call % mesh_size
    b_full = group_size * c
    granges = [
        list(range(g0, min(g0 + group_size, len(files))))
        for g0 in range(0, len(files), group_size)
    ]

    staged: deque = deque()
    fetcher = ThreadPoolExecutor(max_workers=2)

    def _fetch(out):
        with _pt("encode_fetch"):
            r = jax.device_get(out)
        if PIPELINE_TIMES is not None:
            PIPELINE_TIMES.add(
                "encode_fetch_bytes",
                float(sum(a.nbytes for a in jax.tree_util.tree_leaves(r))),
            )
        return r

    def _put(x):
        if PIPELINE_TIMES is None:
            return jax.device_put(x)
        # attribution mode: block so the measured time is the transfer, not
        # the enqueue (serializes the upload against dispatch; acceptable
        # for a measurement run)
        PIPELINE_TIMES.add(
            "encode_put_bytes",
            float(sum(a.nbytes for a in jax.tree_util.tree_leaves(x))),
        )
        with _pt("encode_put"):
            return jax.block_until_ready(jax.device_put(x))

    for s0 in range(0, len(granges), blocks_per_call):
        sub = granges[s0 : s0 + blocks_per_call]
        nb = len(sub)
        if mesh_size:  # pad to a whole number of shards
            nb = -(-nb // mesh_size) * mesh_size
        with _pt("encode_stage"):
            metas = []
            for idxs in sub:
                group = [np.asarray(files[i], dtype=np.int16) for i in idxs]
                frames = [f.shape[0] // c for f in group]
                metas.append((idxs, group, frames))
            nc_max = max(
                -(-fr // fpc) for _idxs, _g, frames in metas for fr in frames
            )

            x = np.zeros((nb, nc_max, fpc, b_full), np.int16)
            frames_lane = np.zeros((nb, b_full), np.int32)
            tail_idx = np.zeros((nb, group_size), np.int32)
            for bi, (idxs, group, frames) in enumerate(metas):
                for j, (f, fr) in enumerate(zip(group, frames)):
                    lanes = slice(j * c, (j + 1) * c)
                    nc_f = -(-fr // fpc)
                    arr = np.zeros((nc_f * fpc, c), np.int16)
                    arr[:fr] = f[: fr * c].reshape(fr, c)
                    x[bi, :nc_f, :, lanes] = arr.reshape(nc_f, fpc, c)
                    frames_lane[bi, lanes] = fr
                    tail_idx[bi, j] = fr // fpc

            h0 = np.broadcast_to(
                np.tile(lms_ops.initial_history(c), (group_size, 1)), (nb, b_full, 4)
            )
            w0 = np.broadcast_to(
                np.tile(lms_ops.initial_weights(c), (group_size, 1)), (nb, b_full, 4)
            )
            p0 = np.zeros((nb, b_full), np.int32)
        if mesh_size:
            from .parallel.pipeline import encode_corpus_blocks_sharded

            out = encode_corpus_blocks_sharded(
                mesh,
                settings.vbr,
                x,
                frames_lane,
                tail_idx,
                h0,
                w0,
                p0,
                sff=sff,
                sfb=sfb,
                residual_size=residual_size,
                base=base if settings.vbr else 0,
                dist=(m1, p1, p2) if settings.vbr else (),
                n_files=group_size,
                use_pallas=use_pallas,
            )
        elif settings.vbr:
            out = encode_corpus_vbr_nv_blocks(
                _put(x),
                frames_lane,
                h0,
                w0,
                p0,
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                base=base,
                dist=(m1, p1, p2),
                n_files=group_size,
                use_pallas=use_pallas,
            )
        else:
            out = encode_corpus_cbr_packed_blocks(
                _put(x),
                frames_lane,
                tail_idx,
                h0,
                w0,
                p0,
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                residual_size=residual_size,
                n_files=group_size,
                use_pallas=use_pallas,
            )
        staged.append((metas, fetcher.submit(_fetch, out)))
        if len(staged) > pipeline_depth:
            assemble(staged.popleft())
    while staged:
        assemble(staged.popleft())
    fetcher.shutdown()
    return results


def decode_range(encoded: bytes, start_frame: int, n_frames: int) -> np.ndarray:
    """Constant-time seek + decode of an arbitrary frame range.

    Every chunk is self-contained (it carries its own LMS entry state,
    reference ``README.md:88-121``), so only the chunks overlapping
    [start_frame, start_frame + n_frames) are read and decoded -- O(range),
    independent of the file position. Returns int16[n_frames * channels].
    """
    header, rect, tail = split_chunks(encoded)
    fpc = header.frames_per_chunk
    c = header.channels
    total = header.total_frames
    if total:
        start_frame = min(start_frame, total)
        n_frames = min(n_frames, total - start_frame)
    if n_frames <= 0:
        return np.zeros(0, dtype=np.int16)
    k0 = start_frame // fpc
    k1 = -(-(start_frame + n_frames) // fpc)

    parts = []
    n_rect = rect.shape[0] if rect is not None else 0
    if k0 < n_rect:
        sub = rect[k0 : min(k1, n_rect)]
        batch = parse_full_chunks(sub, header)
        dqt_flat = jnp.asarray(
            tables.dqt_stacked(batch.scale_factor_bits).reshape(-1), dtype=jnp.int32
        )
        pcm = decode_chunks_packed(
            jnp.asarray(batch.res_bytes),
            jnp.asarray(batch.sf),
            jnp.asarray(batch.rs),
            jnp.asarray(batch.hist),
            jnp.asarray(batch.wts),
            dqt_flat,
            scale_factor_frames=batch.scale_factor_frames,
            frames=fpc,
            residual_size=batch.residual_size,
            use_pallas=default_use_pallas(),
            max_code_bits=_max_code_bits(batch.rs, batch.residual_size),
        )
        parts.append(np.asarray(pcm).reshape(-1, c))
    if k1 > n_rect and tail:
        remaining = total - n_rect * fpc if total > 0 else None
        chunk = SeaChunk.from_bytes(tail, header, remaining)
        model = DecoderModel(c, chunk.scale_factor_bits)
        parts.append(model.decode_chunk(chunk, frames_padded=fpc).reshape(-1, c))
    pcm = np.concatenate(parts) if parts else np.zeros((0, c), np.int16)
    off = start_frame - k0 * fpc
    return pcm[off : off + n_frames].reshape(-1)


def decode_corpus(
    files: list[bytes],
    device_batch: int = 2048,
    on_error: str = "raise",
    mesh=None,
) -> list[SeaDecodeInfo | None]:
    """Decode many .sea files with host-parse / device-compute overlap.

    Files sharing a configuration (chunk geometry, channels, mode) are merged
    into shared device batches -- a 1,000-file corpus of like files decodes in
    a handful of device calls (the BASELINE corpus configuration), and JAX's
    async dispatch overlaps host parsing with device compute. Per-file
    outputs are bit-identical to ``decode_sea``.

    ``mesh``: a ``jax.sharding.Mesh`` -- the merged chunk batch is placed
    with its leading (chunk) axis sharded over every mesh axis; every chunk
    carries its own LMS entry state so the SPMD decode has no collectives
    (the embarrassingly-parallel decode the format was designed for,
    reference ``README.md:88-121``, ``src/codec/chunk.rs:95-103``).

    ``on_error="skip"`` reports undecodable files as ``None`` instead of
    aborting the corpus (batch-pipeline failure containment).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    staged: list[tuple | None] = []
    with _pt("decode_parse"):
        for encoded in files:
            if on_error == "skip":
                try:
                    staged.append(_stage_file_parsed(encoded))
                except Exception:
                    staged.append(None)
            else:
                staged.append(_stage_file_parsed(encoded))

    # group same-config full-chunk batches into shared device batches
    groups: dict[tuple, list[tuple[int, object]]] = {}
    for fi, item in enumerate(staged):
        if item is None:
            continue
        header, batch, frames_real, _tail_chunk, fpc = item
        if batch is None:
            continue
        key = (
            fpc,
            header.channels,
            batch.scale_factor_frames,
            batch.scale_factor_bits,
            batch.residual_size,
            batch.res_bytes.shape[1],
            batch.sf.shape[1],
        )
        groups.setdefault(key, []).append((fi, batch))

    pcm_parts: dict[int, list[np.ndarray]] = {fi: [] for fi in range(len(files))}
    # Ragged tails ride the SAME decode_chunks_packed program as the full
    # chunks: each tail repacks (host side) into a full-chunk packed row --
    # residual section zero-padded to the group byte width, sf/rs padded with
    # suffix windows -- and joins its file's config group. Pad windows address
    # zero bytes or clamp inside the span fetch, so their decoded frames are
    # garbage that the [:frames_in_chunk] slice drops, while every real
    # sample's bit position matches the repacked layout exactly (validated
    # bit-exact for CBR and VBR; docs/PERF.md host-pipeline section). This
    # deletes the old separate tail decode program -- its process-lifetime
    # trace + relay program load (~3-11 s in a fresh process) and its
    # transfers -- tails now cost one host repack plus rows in batches that
    # already exist.
    with _pt("decode_tails"):
        tails_by_key = _merge_tail_rows(staged, groups)
    use_pallas = default_use_pallas()
    mesh_size = mesh.size if mesh is not None and mesh.size > 1 else 0
    if mesh_size:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        chunk_spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    group_outs: list[tuple] = []
    # Deferred-fetch bookkeeping: dispatched outputs stay live on device
    # until drained, so peak device memory tracks the live decoded PCM
    # (~2 bytes x samples). The drain normally happens ONCE after every
    # dispatch (maximal host/device overlap, one pipelined pass over the
    # relay link) -- but when the estimated live bytes exceed
    # SEA_DECODE_MAX_LIVE_BYTES (default 4 GiB; far above the bench corpus,
    # which therefore keeps the single-drain behavior), the pending outputs
    # drain mid-dispatch in waves, so corpora of any size fit in device
    # memory as long as one wave does.
    import os as _os

    max_live = int(_os.environ.get("SEA_DECODE_MAX_LIVE_BYTES", str(4 << 30)))
    pending: list = []  # dispatched, not yet fetched (global dispatch order)
    fetched: list = []  # host arrays, same order
    live_bytes = 0

    def _drain():
        nonlocal live_bytes
        if not pending:
            return
        if len(pending) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with _pt("decode_fetch"), ThreadPoolExecutor(
                min(4, len(pending))
            ) as ex:
                got = list(ex.map(np.asarray, pending))
        else:
            with _pt("decode_fetch"):
                got = [np.asarray(o) for o in pending]
        if PIPELINE_TIMES is not None:
            PIPELINE_TIMES.add(
                "decode_fetch_bytes", float(sum(a.nbytes for a in got))
            )
        fetched.extend(got)
        pending.clear()
        live_bytes = 0

    for key, members in groups.items():
        fpc, c, sff, sfb, residual_size, bw, _w = key
        tails = tails_by_key.get(key, ())
        dqt_flat = jnp.asarray(tables.dqt_stacked(sfb).reshape(-1), dtype=jnp.int32)
        with _pt("decode_stage"):
            res_l = [b.res_bytes for _fi, b in members]
            sf_l = [b.sf for _fi, b in members]
            rs_l = [b.rs for _fi, b in members]
            hist_l = [b.hist for _fi, b in members]
            wts_l = [b.wts for _fi, b in members]
            if tails:
                t_res = np.zeros((len(tails), bw), np.uint8)
                for j, t in enumerate(tails):
                    t_res[j, : t[1].shape[0]] = t[1]
                res_l.append(t_res)
                sf_l.append(np.stack([t[2] for t in tails]))
                rs_l.append(np.stack([t[3] for t in tails]))
                hist_l.append(np.stack([t[4] for t in tails]))
                wts_l.append(np.stack([t[5] for t in tails]))
            res = np.concatenate(res_l)
            sf = np.concatenate(sf_l)
            rs = np.concatenate(rs_l)
            hist = np.concatenate(hist_l)
            wts = np.concatenate(wts_l)
        n = res.shape[0]
        mcb = _max_code_bits(rs, residual_size)
        n_outs = 0
        for startk in range(0, n, device_batch):
            endk = min(startk + device_batch, n)
            args = (
                res[startk:endk],
                sf[startk:endk],
                rs[startk:endk],
                hist[startk:endk],
                wts[startk:endk],
            )
            n_real = endk - startk
            # Pad partial batches up to one compiled shape (a second batch
            # shape costs a full XLA compile, ~tens of seconds on the remote
            # compile service) and, under a mesh, to a whole number of
            # shards. Repeating a valid row keeps every decoded config in
            # range; the padding rows are sliced off before the fetch.
            target = device_batch if n > device_batch else n_real
            if mesh_size:
                target += -target % mesh_size
            pad = target - n_real
            if pad:
                args = tuple(
                    np.concatenate([a, np.repeat(a[:1], pad, axis=0)])
                    for a in args
                )
            if mesh_size:
                # sharded placement: the SPMD decode partitions with no
                # collectives (chunks are self-contained)
                args = tuple(jax.device_put(a, chunk_spec) for a in args)
            elif PIPELINE_TIMES is not None:
                import jax as _jax

                PIPELINE_TIMES.add(
                    "decode_put_bytes", float(sum(a.nbytes for a in args))
                )
                with _pt("decode_put"):
                    args = tuple(
                        _jax.block_until_ready(jnp.asarray(a)) for a in args
                    )
            else:
                args = tuple(jnp.asarray(a) for a in args)
            out = decode_chunks_packed(
                *args,
                dqt_flat,
                scale_factor_frames=sff,
                frames=fpc,
                residual_size=residual_size,
                use_pallas=use_pallas,
                max_code_bits=mcb,
            )
            # pending holds the ONLY reference to each device output, so a
            # drain actually releases the device buffers (a per-group list
            # kept them alive past the fetch, defeating the bound)
            pending.append(out[:n_real] if pad else out)
            n_outs += 1
            live_bytes += target * fpc * c * 2
            if live_bytes >= max_live:
                _drain()
        group_outs.append((members, tails, n_outs))

    # drain everything still pending -- in the common case this is the ONE
    # fetch phase for the whole corpus (full-chunk AND merged tail rows
    # through the same thread pool, pipelining the relay link end to end)
    _drain()
    it = iter(fetched)
    tail_pcm: dict[int, np.ndarray] = {}
    with _pt("decode_assemble"):
        for members, tails, n_outs in group_outs:
            pcm = np.concatenate([next(it) for _ in range(n_outs)])  # [n, fpc, c]
            pos = 0
            for fi, b in members:
                cnt = b.res_bytes.shape[0]
                pcm_parts[fi].append(pcm[pos : pos + cnt])
                pos += cnt
            for fi, _sec, _sf, _rs, _h, _w2, f in tails:
                tail_pcm[fi] = pcm[pos, :f].reshape(-1)
                pos += 1

    results: list[SeaDecodeInfo | None] = []
    with _pt("decode_assemble"):
        results.extend(_decode_corpus_results(staged, pcm_parts, tail_pcm, on_error))
    return results


def _decode_corpus_results(staged, pcm_parts, tail_pcm, on_error):
    results: list[SeaDecodeInfo | None] = []
    for fi, item in enumerate(staged):
        if item is None:
            results.append(None)
            continue
        header, batch, frames_real, tail_chunk, fpc = item
        parts = []
        if batch is not None:
            pcm = pcm_parts[fi][0]
            n = pcm.shape[0]
            if frames_real[n - 1] == fpc:
                parts.append(pcm.reshape(-1))
            else:
                parts.append(pcm[:-1].reshape(-1))
                parts.append(pcm[-1, : frames_real[n - 1]].reshape(-1))
        if tail_chunk is not None:
            parts.append(tail_pcm[fi])
        samples = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int16)
        c = header.channels
        if header.total_frames > 0 and samples.shape[0] < header.total_frames * c:
            if on_error == "skip":
                results.append(None)
                continue
            raise SeaInvalidFrame("stream truncated")
        results.append(
            SeaDecodeInfo(
                samples=samples,
                sample_rate=header.sample_rate,
                channels=header.channels,
            )
        )
    return results


def _tail_packed_row(chunk: SeaChunk, c: int, fpc: int):
    """Repack one ragged tail chunk into the full-chunk packed-row layout.

    Returns ``(sec, sf, rs, f)``: the repacked residual section bytes (real
    samples only, laid out exactly where the full-chunk prefix-sum addressing
    of ``decode_chunks_packed`` expects them -- every real window before the
    last is complete, and within the partial last window the real codes are
    the leading ones), sf/rs padded to the full-chunk window count ``W``
    (suffix windows: sf=0, rs=1 for VBR / the constant width for CBR), and
    the real frame count. The caller zero-pads ``sec`` to the group's byte
    width; bits past it decode to garbage frames that get sliced off.
    Ragged-tail semantics: reference ``src/codec/chunk.rs:76-79,105-106``.
    """
    sff = chunk.scale_factor_frames
    f = chunk.frames_in_chunk
    w = -(-f // sff)
    W = -(-fpc // sff)
    if chunk.chunk_type == CHUNK_TYPE_VBR:
        sizes = chunk.vbr_residual_sizes.reshape(w, c)
        widths = np.repeat(sizes, sff, axis=0)[:f].reshape(-1)
        rs = np.ones((W, c), np.uint8)
        rs[:w] = sizes
    else:
        widths = np.full(f * c, chunk.residual_size, np.int64)
        rs = np.full((W, c), chunk.residual_size, np.uint8)
    sec = bitpack.pack_bits(chunk.residuals.reshape(-1).astype(np.uint32), widths)
    sf = np.zeros((W, c), np.uint8)
    sf[:w] = chunk.scale_factors.reshape(w, c)
    return sec, sf, rs, f


def _merge_tail_rows(staged, groups: dict[tuple, list]) -> dict[tuple, list[tuple]]:
    """Assign every staged file's ragged tail a packed row in a config group.

    A tail whose file has a full-chunk batch of matching config (and whose
    repacked section fits the group's byte width -- always, for CBR; for VBR
    a pathological tiny-chunk config could overflow) joins that group's key.
    The rest (tail-only files, overflow) get natural-width groups: the exact
    full-chunk byte width for CBR, the max repacked length rounded up to 64
    for VBR (keyed into ``groups`` so the caller dispatches them through the
    same ``decode_chunks_packed`` program family).
    """
    tails_by_key: dict[tuple, list[tuple]] = {}
    pend: dict[tuple, list[tuple]] = {}
    for fi, item in enumerate(staged):
        if item is None:
            continue
        header, batch, _fr, chunk, fpc = item
        if chunk is None:
            continue
        c = header.channels
        sec, sf, rs, f = _tail_packed_row(chunk, c, fpc)
        cw = 0 if chunk.chunk_type == CHUNK_TYPE_VBR else chunk.residual_size
        wp = sf.shape[0]
        rec = (fi, sec, sf, rs, chunk.lms_history, chunk.lms_weights, f)
        key = None
        if (
            batch is not None
            and batch.scale_factor_frames == chunk.scale_factor_frames
            and batch.scale_factor_bits == chunk.scale_factor_bits
            and batch.residual_size == cw
            and batch.sf.shape[1] == wp
            and sec.shape[0] <= batch.res_bytes.shape[1]
        ):
            key = (
                fpc,
                c,
                batch.scale_factor_frames,
                batch.scale_factor_bits,
                batch.residual_size,
                batch.res_bytes.shape[1],
                batch.sf.shape[1],
            )
        if key is None:
            pkey = (
                fpc,
                c,
                chunk.scale_factor_frames,
                chunk.scale_factor_bits,
                cw,
                wp,
            )
            pend.setdefault(pkey, []).append(rec)
        else:
            tails_by_key.setdefault(key, []).append(rec)
    for (fpc, c, sff, sfb, cw, wp), lst in pend.items():
        if cw:
            bw = bitpack.packed_byte_len(cw, fpc * c)
        else:
            bw = max(64, -(-max(r[1].shape[0] for r in lst) // 64) * 64)
        key = (fpc, c, sff, sfb, cw, bw, wp)
        tails_by_key.setdefault(key, []).extend(lst)
        groups.setdefault(key, [])
    return tails_by_key


def _stage_file_parsed(encoded: bytes):
    """Host-side parse of one corpus file: (header, ParsedBatch|None,
    frames_real, tail SeaChunk|None, fpc). Tail chunks are only parsed here;
    ``decode_corpus`` batch-decodes every file's tail in one shared device
    call (per config) alongside the full-chunk group batches."""
    header, rect, tail = split_chunks(encoded)
    fpc = header.frames_per_chunk
    batch = None
    frames_real = None
    if rect is not None:
        batch = parse_full_chunks(rect, header)
        n = rect.shape[0]
        frames_real = np.full(n, fpc, dtype=np.int64)
        if header.total_frames > 0:
            frames_real = np.minimum(
                frames_real,
                header.total_frames - np.arange(n, dtype=np.int64) * fpc,
            )
    tail_chunk = None
    if tail:
        n_full = rect.shape[0] if rect is not None else 0
        remaining = (
            header.total_frames - n_full * fpc if header.total_frames > 0 else None
        )
        tail_chunk = SeaChunk.from_bytes(tail, header, remaining)
    return (header, batch, frames_real, tail_chunk, fpc)


# Backwards-compatible helper used by the parallel tests: parsed arrays with
# residuals already unpacked (host side).
def parse_file(encoded: bytes):
    header, rect, tail = split_chunks(encoded)
    c = header.channels
    fpc = header.frames_per_chunk
    arrays = []
    if rect is not None:
        b = parse_full_chunks(rect, header)
        n = rect.shape[0]
        if b.residual_size:
            codes = bitpack.unpack_bits_rows(b.res_bytes, b.residual_size, fpc * c)
        else:
            widths = np.repeat(b.rs, b.scale_factor_frames, axis=1)[:, :fpc]
            codes = bitpack.unpack_bits_rows(b.res_bytes, widths.reshape(n, fpc * c), fpc * c)
        arrays.append(
            (codes.reshape(n, fpc, c), b.sf, b.rs, b.hist, b.wts, b.scale_factor_bits)
        )
        sff = b.scale_factor_frames
    if tail:
        n_full = rect.shape[0] if rect is not None else 0
        remaining = (
            header.total_frames - n_full * fpc if header.total_frames > 0 else None
        )
        chunk = SeaChunk.from_bytes(tail, header, remaining)
        sff = chunk.scale_factor_frames
        f = chunk.frames_in_chunk
        w_real = -(-f // sff)
        w = -(-fpc // sff)
        codes = np.zeros((1, fpc, c), dtype=np.uint8)
        codes[0, :f] = chunk.residuals.reshape(f, c)
        sf = np.zeros((1, w, c), dtype=np.uint8)
        sf[0, :w_real] = chunk.scale_factors.reshape(w_real, c)
        rs = np.ones((1, w, c), dtype=np.uint8)
        if chunk.chunk_type == CHUNK_TYPE_VBR:
            rs[0, :w_real] = chunk.vbr_residual_sizes.reshape(w_real, c)
        else:
            rs[:] = chunk.residual_size
        arrays.append(
            (
                codes,
                sf,
                rs,
                chunk.lms_history.reshape(1, c, 4),
                chunk.lms_weights.reshape(1, c, 4),
                chunk.scale_factor_bits,
            )
        )
    if not arrays:
        return header, None, None
    sfb = arrays[0][5]
    merged = tuple(np.concatenate([a[k] for a in arrays]) for k in range(5))
    n = merged[0].shape[0]
    frames_real = np.full(n, fpc, dtype=np.int64)
    if header.total_frames > 0:
        frames_real = np.minimum(
            frames_real, header.total_frames - np.arange(n, dtype=np.int64) * fpc
        )
    return header, (*merged, sfb), frames_real
