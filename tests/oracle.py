"""Golden-reference oracle: the upstream C decoder, compiled at test time.

The reference repo ships a self-contained ~250-line C decoder (``c/sea.h``).
When the reference checkout is present (read-only, at REFERENCE_PATH), we
compile a tiny wrapper around it into a shared library and use it as a
*golden decoder*: our encoder's output must decode bit-exactly through the
upstream implementation. Nothing from the reference is copied into this
repository; tests that need the oracle are skipped when it is unavailable.

The wrapper also exposes the oracle's dequantization-table builder so our
table generation (numpy float32) is pinned against the platform's powf.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

REFERENCE_PATH = os.environ.get("SEA_REFERENCE_PATH", "/root/reference")

_WRAPPER_SRC = r"""
#include "sea.h"

/* The upstream decoder is PoC-quality: it frees SEA_DQT at the end of a full
   decode without NULLing it (double free on the next call), and it always
   decodes whole scale-factor windows, overrunning the output by up to
   (scale_factor_frames-1)*channels samples on a ragged final chunk. The
   wrapper resets the dangling pointer; callers must pad the output buffer. */
int oracle_decode(uint8_t* encoded, uint32_t encoded_len, uint32_t* sample_rate,
                  uint32_t* channels, int16_t* output, uint32_t* total_frames) {
    int rc = sea_decode(encoded, encoded_len, sample_rate, channels, output, total_frames);
    if (output != NULL) {
        SEA_DQT = NULL;
        SEA_DQT_COLUMNS = 0;
    }
    return rc;
}

/* Dump the oracle's DQT for (scale_factor_bits, residual_bits) into out,
   which must hold (1<<sfb) * (1<<rb) int32 entries. */
void oracle_dump_dqt(uint32_t sfb, uint32_t rb, int32_t* out) {
    SEA_DQT_SCALE_FACTOR_BITS = 0; /* force rebuild */
    SEA_DQT_RESIDUAL_BITS = 0;
    sea_alloc_prepare_dqt(sfb, rb);
    uint32_t n = (1u << sfb) * SEA_DQT_COLUMNS;
    for (uint32_t i = 0; i < n; i++) out[i] = SEA_DQT[i];
}
"""

_lib = None
_lib_checked = False


def get_oracle():
    """Compile (once) and return the ctypes library, or None if unavailable."""
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    header = os.path.join(REFERENCE_PATH, "c", "sea.h")
    if not os.path.exists(header):
        return None
    cache = os.path.join(tempfile.gettempdir(), "sea_oracle")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libsearef.so")
    src_path = os.path.join(cache, "wrapper.c")
    if not os.path.exists(so_path):
        with open(src_path, "w") as f:
            f.write(_WRAPPER_SRC)
        cmd = [
            "gcc", "-O2", "-shared", "-fPIC",
            f"-I{os.path.dirname(header)}",
            src_path, "-o", so_path, "-lm",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    _lib = ctypes.CDLL(so_path)
    _lib.oracle_decode.restype = ctypes.c_int
    _lib.oracle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    _lib.oracle_dump_dqt.restype = None
    _lib.oracle_dump_dqt.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return _lib


def oracle_decode(encoded: bytes) -> tuple[np.ndarray, int, int]:
    """Decode .sea bytes with the upstream C decoder (CBR only)."""
    lib = get_oracle()
    assert lib is not None
    buf = (ctypes.c_uint8 * len(encoded)).from_buffer_copy(encoded)
    rate = ctypes.c_uint32()
    channels = ctypes.c_uint32()
    frames = ctypes.c_uint32()
    # probe call
    rc = lib.oracle_decode(buf, len(encoded), ctypes.byref(rate), ctypes.byref(channels), None, ctypes.byref(frames))
    assert rc == 0, rc
    n = frames.value * channels.value
    # Pad for the oracle's whole-window overrun on ragged final chunks
    # (up to 255 extra frames x 255 channels).
    out = np.zeros(n + 255 * 256, dtype=np.int16)
    buf2 = (ctypes.c_uint8 * len(encoded)).from_buffer_copy(encoded)
    rc = lib.oracle_decode(
        buf2,
        len(encoded),
        ctypes.byref(rate),
        ctypes.byref(channels),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(frames),
    )
    assert rc == 0, rc
    return out[:n], rate.value, channels.value


def oracle_dqt(scale_factor_bits: int, residual_bits: int) -> np.ndarray:
    """The upstream decoder's dequant table [2^sfb, 2^rb] int32."""
    lib = get_oracle()
    assert lib is not None
    n_sf = 1 << scale_factor_bits
    n_code = 1 << residual_bits
    out = np.zeros(n_sf * n_code, dtype=np.int32)
    lib.oracle_dump_dqt(
        scale_factor_bits, residual_bits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out.reshape(n_sf, n_code)
