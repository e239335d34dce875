from .binding import (
    available,
    native_decode,
    native_dump_dqt,
    native_dump_reciprocals,
    native_encode,
    native_pack_rows,
)

__all__ = [
    "available",
    "native_encode",
    "native_decode",
    "native_dump_dqt",
    "native_dump_reciprocals",
    "native_pack_rows",
]
