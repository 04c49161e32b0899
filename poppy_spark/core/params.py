"""Sizing math, parameters and errors for poppy-compatible Bloom filters.

Formulas mirror ``poppy/src/bloom/utils.rs:2-24``; parameter plumbing mirrors
``poppy/src/bloom.rs:10-181`` (Flags / OptLevel / Params / error taxonomy).
"""

from __future__ import annotations

import enum
import math
import sys
from dataclasses import dataclass, field

DEFAULT_VERSION = 2  # poppy/src/bloom.rs:10

#: smallest positive normal f64 — poppy validates fpp in [f64::MIN_POSITIVE; 1]
#: (``poppy/src/bloom/v1.rs:105``, ``v2.rs:282``).
MIN_POSITIVE = sys.float_info.min


class PoppyError(Exception):
    """Base error (mirrors ``poppy/src/bloom.rs:98-114``)."""


class WrongFpp(PoppyError):
    pass


class InvalidVersion(PoppyError):
    pass


class MergeError(PoppyError):
    pass


class TooManyEntries(PoppyError):
    """Raised when an insert would exceed the sized capacity
    (``poppy/src/bloom.rs:110-111``)."""


class OptLevel(enum.IntEnum):
    """Optimization level carried in the flags header
    (``poppy/src/bloom.rs:53-60``)."""

    NONE = 0
    SPACE = 1
    SPEED = 2
    BEST = 3


def _f64_as_u64(x: float) -> int:
    """Rust ``as u64``: truncate toward zero, NaN -> 0, saturate at bounds."""
    if math.isnan(x) or x <= 0.0:
        return 0
    if x >= 2.0**64:
        return (1 << 64) - 1
    return int(x)


def k(bit_size: int, cap: int) -> int:
    """Number of hash functions: ceil(ln2 * m / n) (``utils.rs:2-4``).

    Uses f64 division like the reference, so cap == 0 yields inf/NaN and the
    Rust ``as u64`` cast semantics (saturate / zero) apply.
    """
    if cap == 0:
        return 0 if bit_size == 0 else (1 << 64) - 1
    return _f64_as_u64(math.ceil(math.log(2.0) * bit_size / cap))


def bit_size(cap: int, proba: float) -> int:
    """Bits for capacity/fpp: |ceil(n * ln p / ln^2 2)| (``utils.rs:7-11``)."""
    return int(abs(math.ceil(cap * math.log(proba) / math.log(2.0) ** 2)))


def estimate_p(n: int, m_bits: int) -> float:
    """Predicted fpp for n entries in m bits (``utils.rs:16-19``)."""
    kk = k(m_bits, n)
    return (1.0 - math.exp(-kk * n / m_bits)) ** kk


def cap_from_bit_size(m_bits: int, proba: float) -> int:
    """Inverse of :func:`bit_size` (``utils.rs:22-24``)."""
    return int(abs(m_bits * math.log(2.0) ** 2 / math.log(proba)))


def check_fpp(fpp: float) -> None:
    if not (MIN_POSITIVE <= fpp <= 1.0):
        raise WrongFpp(f"fpp value must be in ]0;1] fpp={fpp}")


def next_power_of_two(x: int) -> int:
    """Rust's ``u64::next_power_of_two`` semantics (0 and 1 map to 1)."""
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


@dataclass(frozen=True)
class Params:
    """Creation-time parameters (``poppy/src/bloom.rs:129-174``)."""

    capacity: int
    fpp: float
    version: int = DEFAULT_VERSION
    opt: OptLevel = field(default=OptLevel.NONE)

    def with_version(self, version: int) -> "Params":
        return Params(self.capacity, self.fpp, version, self.opt)

    def with_opt(self, opt: OptLevel) -> "Params":
        return Params(self.capacity, self.fpp, self.version, OptLevel(opt))


def flags_bytes(version: int, opt: OptLevel) -> bytes:
    """8-byte header ``[version, opt, 6x0]`` (``poppy/src/bloom.rs:40-42``)."""
    return bytes([version, int(opt), 0, 0, 0, 0, 0, 0])


def parse_flags(b: bytes) -> tuple[int, OptLevel, bytes]:
    if len(b) < 8:
        raise PoppyError("truncated flags header")
    try:
        opt = OptLevel(b[1])
    except ValueError as e:
        raise PoppyError(f"invalid opt-level={b[1]}") from e
    return b[0], opt, bytes(b[2:8])
