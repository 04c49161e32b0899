"""poppy v1 (DCSO-compatible) Bloom filter, numpy-backed.

Wire format (all little-endian, ``poppy/src/bloom/v1.rs:215-233``)::

    flags[8] | capacity u64 | fpp f64 | n_hash u64 | bit_size u64 | count u64
    | bitset as ceil(m/64) LE u64 words | attached data ... EOF

v1 exists for byte-compatibility with DCSO-format filters only; its fpp is
not guaranteed when the bit size lands on a power of two (demonstrated by the
reference's ``test_show_bug_in_v1``, ``v1.rs:603-630``).  Prefer v2.

Deviation from the reference: ``size_in_bytes`` reports true bytes; the
reference over-reports by 64x (``v1.rs:344-354`` returns ``bit_size * 8``).
"""

from __future__ import annotations

import io
import math
import struct

import numpy as np

from . import hashkern as hk
from . import statekern as sk
from .params import (
    MergeError,
    OptLevel,
    Params,
    PoppyError,
    bit_size,
    check_fpp,
    estimate_p,
    flags_bytes,
    k as k_fn,
    parse_flags,
)

_HDR = struct.Struct("<QdQQQ")  # capacity, fpp, n_hash, bit_size, count


class BloomV1:
    version = 1

    def __init__(
        self,
        capacity: int,
        fpp: float,
        n_hash: int,
        m_bits: int,
        count: int = 0,
        words: np.ndarray | None = None,
        data: bytes = b"",
        opt: OptLevel = OptLevel.NONE,
        reserved: bytes = b"\0" * 6,
        partial: bool = False,
    ):
        self.capacity = capacity
        self.fpp = fpp
        self.n_hash = n_hash
        self.bit_size = m_bits
        self.count = count
        self.opt = opt
        self.reserved = reserved
        self.partial = partial
        n_words = math.ceil(m_bits / 64)
        if words is None and not partial:
            words = np.zeros(n_words, dtype="<u8")
        self.words = words if words is not None else np.zeros(0, dtype="<u8")
        self.data = bytes(data)

    # --- construction ---------------------------------------------------------
    @classmethod
    def with_capacity(cls, capacity: int, fpp: float) -> "BloomV1":
        check_fpp(fpp)
        m = bit_size(capacity, fpp)
        return cls(capacity, fpp, k_fn(m, capacity), m)

    @classmethod
    def from_params(cls, p: Params) -> "BloomV1":
        return cls.with_capacity(p.capacity, p.fpp)

    # --- hashing --------------------------------------------------------------
    def _indexes(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        return hk.v1_index_batch(hk.fnv1_batch(mat, lens), self.n_hash, self.bit_size)

    # --- core ops ---------------------------------------------------------------
    def insert_packed(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        idx = self._indexes(mat, lens)
        self.count, new = sk.v1_insert_batch(self.words, idx, self.count, self.capacity)
        return new

    def insert_packed_bulk(self, mat: np.ndarray, lens: np.ndarray) -> None:
        """OR-only bulk insert for distributed partial builds: no per-key
        newness hash pass, count left for the merge's re-estimate
        (``poppy/src/bloom/v1.rs:411-426``)."""
        idx = self._indexes(mat, lens)
        if idx.shape[0] == 0:
            return
        from .statekern import _or_scatter_bits

        _or_scatter_bits(self.words.view("uint8"), idx.astype("uint64").reshape(-1))

    def insert_batch(self, keys) -> np.ndarray:
        return self.insert_packed(*hk.pack_keys(keys))

    def insert_bytes(self, key) -> bool:
        return bool(self.insert_batch([key])[0])

    def contains_packed(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        if self.words.size == 0:
            return np.zeros(mat.shape[0], dtype=bool)
        return sk.v1_contains_batch(self.words, self._indexes(mat, lens))

    def contains_batch(self, keys) -> np.ndarray:
        return self.contains_packed(*hk.pack_keys(keys))

    def contains_bytes(self, key) -> bool:
        return bool(self.contains_batch([key])[0])

    def clear(self) -> None:
        self.words.fill(0)
        self.count = 0

    # --- metadata ---------------------------------------------------------------
    def count_ones(self) -> int:
        return sk.popcount(self.words)

    def count_estimate(self) -> int:
        return self.count

    def update_count(self) -> None:
        """Re-estimate count from the popcount (``v1.rs:330-334``)."""
        self.count = sk.count_estimate_from_ones(
            self.bit_size, self.count_ones(), self.n_hash
        )

    def estimated_p(self) -> float:
        return estimate_p(max(self.count_estimate(), 1), self.bit_size)

    def is_full(self) -> bool:
        return self.count_estimate() == self.capacity

    def size_in_bytes(self) -> int:
        # true size (deviation: the reference over-reports 64x, v1.rs:344-354)
        return math.ceil(self.bit_size / 64) * 8

    def has_same_params(self, other: "BloomV1") -> bool:
        return (
            isinstance(other, BloomV1)
            and self.opt == other.opt
            and self.reserved == other.reserved
            and self.capacity == other.capacity
            and self.fpp == other.fpp
            and self.n_hash == other.n_hash
            and self.bit_size == other.bit_size
            and self.words.size == other.words.size
        )

    # --- merges -------------------------------------------------------------------
    def union_merge(self, other: "BloomV1") -> None:
        if not self.has_same_params(other):
            raise MergeError("cannot make union of bloom filters with different parameters")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.update_count()

    def count_common_entries(self, other: "BloomV1") -> int:
        if not self.has_same_params(other):
            raise MergeError("cannot compare filters with different parameters")
        common = sk.popcount(self.words & other.words)
        return sk.count_estimate_from_ones(self.bit_size, common, self.n_hash)

    # --- serialization ---------------------------------------------------------------
    def dumps(self) -> bytes:
        out = io.BytesIO()
        out.write(flags_bytes(1, self.opt))
        out.write(_HDR.pack(self.capacity, self.fpp, self.n_hash, self.bit_size, self.count))
        out.write(self.words.astype("<u8", copy=False).tobytes())
        out.write(self.data)
        return out.getvalue()

    @classmethod
    def loads(cls, raw: bytes, partial: bool = False) -> "BloomV1":
        version, opt, reserved = parse_flags(raw[:8])
        if version != 1:
            raise PoppyError(f"invalid version {version}")
        cap, fpp, n_hash, m_bits, count = _HDR.unpack_from(raw, 8)
        off = 8 + _HDR.size
        n_words = math.ceil(m_bits / 64)
        nbytes = n_words * 8
        if partial:
            words = None
        else:
            if len(raw) < off + nbytes:
                raise PoppyError("truncated v1 filter")
            words = np.frombuffer(raw[off : off + nbytes], dtype="<u8").copy()
        data = raw[off + nbytes :]
        return cls(
            cap, fpp, n_hash, m_bits, count, words, data, opt, reserved, partial=partial
        )
