"""ctypes binding for the native C++ scalar codec (built on demand).

The shared library is compiled once per machine into a cache directory with
the system C++ compiler; if no compiler is available the binding reports
``available() == False`` and callers fall back to the JAX/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sea_native.cpp")

_lib = None
_checked = False


def _build() -> str | None:
    cache = os.environ.get(
        "SEA_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "sea_native_build")
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libsea_native.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so_path],
                check=True,
                capture_output=True,
            )
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


def _get():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.sea_native_encode.restype = ctypes.c_int
    lib.sea_native_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint64,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sea_native_decode.restype = ctypes.c_int
    lib.sea_native_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sea_native_free.restype = None
    lib.sea_native_free.argtypes = [ctypes.c_void_p]
    lib.sea_native_dump_dqt.restype = None
    lib.sea_native_dump_dqt.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.sea_native_dump_reciprocals.restype = None
    lib.sea_native_dump_reciprocals.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sea_native_pack_rows.restype = None
    lib.sea_native_pack_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _get() is not None


def native_encode(
    samples: np.ndarray,
    sample_rate: int,
    channels: int,
    scale_factor_bits: int = 4,
    scale_factor_frames: int = 20,
    residual_bits: float = 3.0,
    frames_per_chunk: int = 5120,
    vbr: bool = False,
    metadata: str = "",
) -> bytes:
    lib = _get()
    assert lib is not None
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_uint64()
    meta = metadata.encode("utf-8")
    rc = lib.sea_native_encode(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        samples.shape[0],
        channels,
        sample_rate,
        scale_factor_bits,
        scale_factor_frames,
        residual_bits,
        frames_per_chunk,
        1 if vbr else 0,
        meta,
        len(meta),
        ctypes.byref(out),
        ctypes.byref(out_len),
    )
    if rc != 0:
        raise ValueError(f"native encode failed: {rc}")
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.sea_native_free(out)


def native_decode(encoded: bytes) -> tuple[np.ndarray, int, int]:
    """Returns (samples int16[], sample_rate, channels)."""
    lib = _get()
    assert lib is not None
    buf = np.frombuffer(encoded, dtype=np.uint8)
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    frames = ctypes.c_uint64()
    rc = lib.sea_native_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(encoded),
        None,
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(frames),
    )
    if rc != 0:
        raise ValueError(f"native decode probe failed: {rc}")
    # format bound: residuals are >= 1 bit/sample, so decoded bytes can never
    # exceed 16x the stream bytes; a corrupt header that probes bigger must
    # not drive the allocation (fuzzing: 2 TB np.zeros from a flipped header)
    if frames.value * channels.value * 2 > 16 * len(encoded) + 4096:
        raise ValueError("native decode probe: implausible decoded size")
    out = np.zeros(frames.value * channels.value, dtype=np.int16)
    rc = lib.sea_native_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(encoded),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(frames),
    )
    if rc != 0:
        raise ValueError(f"native decode failed: {rc}")
    return out, rate.value, channels.value


def native_dump_dqt(scale_factor_bits: int, residual_bits: int) -> np.ndarray:
    lib = _get()
    assert lib is not None
    n = (1 << scale_factor_bits) * (1 << residual_bits)
    out = np.zeros(n, dtype=np.int32)
    lib.sea_native_dump_dqt(
        scale_factor_bits, residual_bits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out.reshape(1 << scale_factor_bits, 1 << residual_bits)


def native_dump_reciprocals(scale_factor_bits: int, residual_bits: int) -> np.ndarray:
    lib = _get()
    assert lib is not None
    out = np.zeros(1 << scale_factor_bits, dtype=np.int32)
    lib.sea_native_dump_reciprocals(
        scale_factor_bits, residual_bits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out


def native_pack_rows(
    values: np.ndarray,  # uint8[N, count]
    widths,  # int (constant) or uint8[N, count] per-item widths
    row_bytes: int,
    n_threads: int = 4,
) -> np.ndarray:
    """Row-batched MSB-first bitpack through the C++ codec -> uint8[N, row_bytes].

    The C call releases the GIL, so independent row blocks pack on a small
    thread pool. Semantics identical to ``ops.bitpack.pack_bits_rows``."""
    lib = _get()
    assert lib is not None
    values = np.ascontiguousarray(values, dtype=np.uint8)
    n, count = values.shape
    out = np.zeros((n, row_bytes), dtype=np.uint8)
    if np.isscalar(widths) or np.ndim(widths) == 0:
        const_w = int(widths)
        warr = None
    else:
        const_w = 0
        warr = np.ascontiguousarray(widths, dtype=np.uint8)
        assert warr.shape == (n, count)
    if n == 0 or count == 0:
        return out

    u8p = ctypes.POINTER(ctypes.c_uint8)

    def pack_block(r0: int, r1: int) -> None:
        lib.sea_native_pack_rows(
            values[r0:r1].ctypes.data_as(u8p),
            warr[r0:r1].ctypes.data_as(u8p) if warr is not None else None,
            const_w,
            r1 - r0,
            count,
            row_bytes,
            out[r0:r1].ctypes.data_as(u8p),
        )

    if n < 64 or n_threads <= 1:
        pack_block(0, n)
    else:
        from concurrent.futures import ThreadPoolExecutor

        step = -(-n // n_threads)
        bounds = [(r, min(r + step, n)) for r in range(0, n, step)]
        with ThreadPoolExecutor(len(bounds)) as ex:
            list(ex.map(lambda b: pack_block(*b), bounds))
    return out
