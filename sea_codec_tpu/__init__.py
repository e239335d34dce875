"""sea-codec-tpu: a TPU-native (JAX/XLA/Pallas) implementation of the SEA audio codec.

A brand-new framework with the capabilities of the reference Rust implementation
(chanderlud/sea-codec): CBR/VBR encoding, streaming encode/decode sessions, the
``.sea`` container format (bit-exact), metadata, up to 255 channels, a
``seaconv``-compatible CLI, and a batch/distributed transcoding pipeline that
shards chunk-parallel decode over a TPU mesh.

Architecture (see SURVEY.md for the reference layer map this mirrors):

- ``ops/``       -- DSP math: quant/dequant tables, bit pack/unpack, the LMS
                    predictor recurrence as ``lax.scan`` kernels, device-side
                    chunk decode and scale-factor-search encode.
- ``models/``    -- codec models assembled from ops: the CBR encoder, the VBR
                    two-pass encoder, and the chunk decoder.
- ``container.py`` -- the ``.sea`` file/chunk framing (host-side bytes).
- ``encoder.py``/``decoder.py`` -- streaming sessions over file-like objects.
- ``api.py``     -- one-shot ``sea_encode``/``sea_decode``.
- ``parallel/``  -- jax.sharding mesh pipeline for corpus-scale transcode.
- ``native/``    -- a small clean-room C++ host library (bitpacking + scalar
                    codec) used as a fast host backend and as a test oracle.

The codec's integer semantics require 64-bit integer arithmetic in the encoder
rank accumulation, so importing this package enables ``jax_enable_x64``.
All kernels use explicit dtypes; the decode path is pure int32.
"""

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

from .api import SeaDecodeInfo, sea_decode, sea_encode  # noqa: E402
from .encoder import EncoderSettings, SeaEncoder  # noqa: E402
from .decoder import SeaDecoder  # noqa: E402
from .utils.errors import SeaError  # noqa: E402
from .utils.metadata import format_metadata, lookup_metadata, parse_metadata  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "sea_encode",
    "sea_decode",
    "SeaDecodeInfo",
    "SeaEncoder",
    "SeaDecoder",
    "EncoderSettings",
    "SeaError",
    "format_metadata",
    "parse_metadata",
    "lookup_metadata",
    "__version__",
]
