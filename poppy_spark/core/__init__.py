"""Core (Spark-free) poppy-compatible sketch kernels."""

from .bloom import BloomFilter, load, loads
from .params import (
    DEFAULT_VERSION,
    InvalidVersion,
    MergeError,
    OptLevel,
    Params,
    PoppyError,
    TooManyEntries,
    WrongFpp,
    bit_size,
    cap_from_bit_size,
    estimate_p,
    k,
)
from .v1 import BloomV1
from .v2 import BloomV2

__all__ = [
    "BloomFilter",
    "BloomV1",
    "BloomV2",
    "DEFAULT_VERSION",
    "InvalidVersion",
    "MergeError",
    "OptLevel",
    "Params",
    "PoppyError",
    "TooManyEntries",
    "WrongFpp",
    "bit_size",
    "cap_from_bit_size",
    "estimate_p",
    "k",
    "load",
    "loads",
]
