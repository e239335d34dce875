"""Distributed corpus transcoding over a TPU mesh.

The reference is single-threaded end to end (SURVEY.md section 2); the
parallelism here is derived from the *format's* structure, not ported:

- **decode** is embarrassingly parallel across chunks (each chunk carries its
  own LMS entry state), so a chunk batch shards over every mesh axis at once
  -- pure data parallelism with no collectives on the compute path.
- **encode** is sequential across windows *within* a file (the LMS and
  prev-scale-factor carry, ``encoder_base.rs:180-185``) but independent
  across files and channels, so files shard across the mesh and each device
  runs the window scan for its files; the per-chunk entry LMS states needed
  by the container are captured by an inner scan over chunks.

``corpus_transcode_step`` is the "training step" analog: a single jitted
program that encodes a sharded batch of files and decodes the resulting
chunks, with an explicit resharding (files -> files x chunks) between the
two phases so decode uses the full mesh even when files < devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lms as lms_ops
from ..ops import tables
from ..ops.device_decode import decode_chunks_fn
from ..ops.device_encode import encode_windows_fn


def _shard_map(f, mesh, in_specs, out_specs):
    """``jax.shard_map`` with replication checking off, working on both the
    stable API (jax>=0.7, ``check_vma``) and the older experimental one
    (``check_rep``)."""
    try:
        from jax import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as shard_map_exp

        return shard_map_exp(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


def make_mesh(
    n_devices: int | None = None, axis_names=("files", "chunks"), devices=None
) -> Mesh:
    """A 2D mesh over the first ``n_devices`` devices (files x chunks).

    Pass ``devices=jax.local_devices()`` for a per-host mesh in a
    multi-host (jax.distributed) deployment."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    # split n_devices into the most-square a x b factorization
    a = int(np.floor(np.sqrt(n_devices)))
    while n_devices % a:
        a -= 1
    return Mesh(np.asarray(devices).reshape(a, n_devices // a), axis_names)


def shard_chunk_batch(mesh: Mesh, *arrays):
    """Place chunk-batch arrays with the leading axis sharded over the whole
    mesh (chunk-parallel decode)."""
    spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return tuple(jax.device_put(a, spec) for a in arrays)


def _encode_file(samples, rs, n_valid, dqt_flat, recip, qtab, qt_offsets, sff, n_cand):
    """Encode one file -> per-chunk (entry LMS, sf, codes).

    samples: int32[n_chunks, fpc, C]; rs: int32[n_chunks, wpc, C];
    n_valid: int32[n_chunks, wpc].
    """
    c = samples.shape[2]
    hist0 = jnp.asarray(lms_ops.initial_history(c))
    wts0 = jnp.asarray(lms_ops.initial_weights(c))
    prev0 = jnp.zeros((c,), dtype=jnp.int32)

    def chunk_body(carry, xs):
        hist, wts, prev = carry
        smp, rs_c, nv = xs
        sf, codes, _ranks, h2, w2, p2 = encode_windows_fn(
            smp.reshape(-1, c),
            rs_c,
            nv,
            hist,
            wts,
            prev,
            dqt_flat,
            recip,
            qtab,
            qt_offsets,
            scale_factor_frames=sff,
            n_candidates=n_cand,
        )
        return (h2, w2, p2), (sf, codes, hist, wts)

    _, (sf, codes, ehist, ewts) = jax.lax.scan(
        chunk_body, (hist0, wts0, prev0), (samples, rs, n_valid)
    )
    return sf, codes, ehist, ewts


def corpus_transcode_step(
    mesh: Mesh,
    samples: jnp.ndarray,  # int32[n_files, n_chunks, fpc, C]
    residual_size: int,
    scale_factor_bits: int,
    scale_factor_frames: int,
):
    """One fused encode+decode step over a sharded corpus.

    Returns (pcm int16[n_files, n_chunks, fpc, C], codes uint8[...]) --
    the decoded PCM must equal the reference round trip for these samples.
    """
    sff = scale_factor_frames
    n_cand = 1 << scale_factor_bits
    nf, nc, fpc, c = samples.shape
    wpc = -(-fpc // sff)

    dqt_flat = jnp.asarray(tables.dqt_stacked(scale_factor_bits).reshape(-1), jnp.int32)
    recip = jnp.asarray(tables.reciprocals_stacked(scale_factor_bits), jnp.int32)
    qtab = jnp.asarray(tables.quant_tab(), jnp.int32)
    qt_offsets = jnp.asarray(tables.quant_offsets(), jnp.int32)

    files_spec = NamedSharding(mesh, P("files"))
    chunks_spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    def step(samples):
        rs = jnp.full((nc, wpc, c), residual_size, dtype=jnp.int32)
        nv = jnp.full((nc, wpc), sff, dtype=jnp.int32)
        enc = jax.vmap(
            lambda s: _encode_file(
                s, rs, nv, dqt_flat, recip, qtab, qt_offsets, sff, n_cand
            )
        )(samples)
        sf, codes, ehist, ewts = enc  # [NF, NC, ...]

        # Reshard: encode was file-parallel; decode is chunk-parallel over
        # the full mesh (files x chunks flattened onto every device).
        codes_b = jax.lax.with_sharding_constraint(
            codes.reshape(nf * nc, fpc, c), chunks_spec
        )
        sf_b = sf.reshape(nf * nc, wpc, c)
        rs_b = jnp.full((nf * nc, wpc, c), residual_size, dtype=jnp.uint8)
        hist_b = ehist.reshape(nf * nc, c, 4)
        wts_b = ewts.reshape(nf * nc, c, 4)
        pcm = decode_chunks_fn(
            codes_b, sf_b, rs_b, hist_b, wts_b, dqt_flat, scale_factor_frames=sff
        )
        return pcm.reshape(nf, nc, fpc, c), codes.astype(jnp.uint8)

    step_jit = jax.jit(
        step, in_shardings=files_spec, out_shardings=(files_spec, files_spec)
    )
    with mesh:
        return step_jit(jax.device_put(samples, files_spec))


@partial(
    jax.jit,
    static_argnames=("mesh", "sff", "sfb", "residual_size", "n_files", "use_pallas"),
)
def _corpus_cbr_blocks_sharded(
    mesh, samples, frames, tail_idx, hist0, wts0, prev0,
    sff, sfb, residual_size, n_files, use_pallas,
):
    from ..ops.encode_file import _corpus_cbr_packed_core

    spec = P(tuple(mesh.axis_names))

    def local(smp, fr, ti, h, w, pv):
        def one(args):
            return _corpus_cbr_packed_core(
                *args,
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                residual_size=residual_size,
                n_files=n_files,
                use_pallas=use_pallas,
            )

        return jax.lax.map(one, (smp, fr, ti, h, w, pv))

    fn = _shard_map(local, mesh, in_specs=(spec,) * 6, out_specs=(spec,) * 8)
    return fn(samples, frames, tail_idx, hist0, wts0, prev0)


@partial(
    jax.jit,
    static_argnames=("mesh", "sff", "sfb", "base", "dist", "n_files", "use_pallas"),
)
def _corpus_vbr_blocks_sharded(
    mesh, samples, frames, hist0, wts0, prev0,
    sff, sfb, base, dist, n_files, use_pallas,
):
    from ..ops.encode_file import _corpus_vbr_nv_core

    spec = P(tuple(mesh.axis_names))

    def local(smp, fr, h, w, pv):
        def one(args):
            return _corpus_vbr_nv_core(
                *args,
                scale_factor_frames=sff,
                scale_factor_bits=sfb,
                base=base,
                dist=dist,
                n_files=n_files,
                use_pallas=use_pallas,
            )

        return jax.lax.map(one, (smp, fr, h, w, pv))

    fn = _shard_map(local, mesh, in_specs=(spec,) * 5, out_specs=(spec,) * 8)
    return fn(samples, frames, hist0, wts0, prev0)


def encode_corpus_blocks_sharded(
    mesh: Mesh,
    vbr: bool,
    samples,  # [NB, nc, fpc, B] with NB a multiple of mesh.size
    frames,  # [NB, B]
    tail_idx,  # [NB, n_files] (CBR only; ignored for VBR)
    hist0, wts0, prev0,  # [NB, B, 4] / [NB, B]
    *,
    sff: int,
    sfb: int,
    residual_size: int = 0,
    base: int = 0,
    dist: tuple = (),
    n_files: int,
    use_pallas: bool,
):
    """Mesh-parallel corpus encode: lane *blocks* shard across every mesh
    axis (pure data parallelism -- blocks are independent streams, so the
    SPMD program has no collectives; the analog of the format-level file
    parallelism the reference's container was designed for,
    ``/root/reference/README.md:88-121``). Each device runs the fused
    scan + on-device serialization for its blocks; outputs come back
    sharded the same way and are fetched once by the caller."""
    spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    put = lambda a: jax.device_put(a, spec)
    if vbr:
        return _corpus_vbr_blocks_sharded(
            mesh, put(samples), put(frames), put(hist0), put(wts0), put(prev0),
            sff=sff, sfb=sfb, base=base, dist=dist,
            n_files=n_files, use_pallas=use_pallas,
        )
    return _corpus_cbr_blocks_sharded(
        mesh, put(samples), put(frames), put(tail_idx),
        put(hist0), put(wts0), put(prev0),
        sff=sff, sfb=sfb, residual_size=residual_size,
        n_files=n_files, use_pallas=use_pallas,
    )


def decode_chunk_batch_sharded(
    mesh: Mesh,
    codes: np.ndarray,
    sf: np.ndarray,
    rs: np.ndarray,
    hist: np.ndarray,
    wts: np.ndarray,
    scale_factor_bits: int,
    scale_factor_frames: int,
):
    """Chunk-parallel decode across the whole mesh (pure data parallel)."""
    dqt_flat = jnp.asarray(tables.dqt_stacked(scale_factor_bits).reshape(-1), jnp.int32)
    spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        partial(decode_chunks_fn, scale_factor_frames=scale_factor_frames),
        in_shardings=(spec, spec, spec, spec, spec, rep),
        out_shardings=spec,
    )
    args = shard_chunk_batch(mesh, codes, sf, rs, hist, wts)
    with mesh:
        return fn(*args, dqt_flat)
