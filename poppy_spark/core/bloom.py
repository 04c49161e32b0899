"""Version-dispatching Bloom filter facade — the user-facing API surface.

Mirrors the reference Python binding surface (``python/src/lib.rs:27-151``):
``load``/``loads`` module functions, ``BloomFilter(capacity, fpp)`` with
``with_version`` / ``with_params`` constructors, insert/contains/union/
count_common_entries/dumps/save methods plus version/capacity/fpp/
count_estimate/data getters — extended with the batch verbs
(``insert_batch`` / ``contains_batch``) that the Spark kernels use.
"""

from __future__ import annotations

import numpy as np

from .params import (
    InvalidVersion,
    MergeError,
    OptLevel,
    Params,
    PoppyError,
)
from .v1 import BloomV1
from .v2 import BloomV2


class BloomFilter:
    """V1/V2 dispatching filter (``poppy/src/bloom.rs:197-418``)."""

    def __init__(self, capacity: int, fpp: float):
        self._inner = BloomV2.with_capacity(capacity, fpp)

    # --- constructors -----------------------------------------------------------
    @classmethod
    def _wrap(cls, inner) -> "BloomFilter":
        obj = cls.__new__(cls)
        obj._inner = inner
        return obj

    @classmethod
    def with_capacity(cls, capacity: int, fpp: float) -> "BloomFilter":
        return cls._wrap(BloomV2.with_capacity(capacity, fpp))

    @classmethod
    def with_version(cls, version: int, capacity: int, fpp: float) -> "BloomFilter":
        return cls.with_params(version, capacity, fpp, OptLevel.NONE)

    @classmethod
    def with_params(
        cls, version: int, capacity: int, fpp: float, opt: int | OptLevel = OptLevel.NONE
    ) -> "BloomFilter":
        opt = OptLevel(opt)
        if version == 1:
            return cls._wrap(BloomV1.with_capacity(capacity, fpp))
        if version == 2:
            return cls._wrap(BloomV2.make(capacity, fpp, opt))
        raise InvalidVersion(f"invalid version {version}")

    @classmethod
    def from_params(cls, p: Params) -> "BloomFilter":
        return cls.with_params(p.version, p.capacity, p.fpp, p.opt)

    # --- inserts / lookups --------------------------------------------------------
    def insert_bytes(self, key) -> bool:
        return self._inner.insert_bytes(_as_bytes(key))

    insert_str = insert_bytes

    def insert_batch(self, keys) -> np.ndarray:
        return self._inner.insert_batch(keys)

    def insert_packed(self, mat, lens) -> np.ndarray:
        return self._inner.insert_packed(mat, lens)

    def route_packed(self, mat, lens):
        """Hash-once routing (v2 only); see BloomV2.route_packed."""
        return self._inner.route_packed(mat, lens)

    def or_routed(self, ibucket, idx, bucket_hash) -> None:
        """OR-only scatter of pre-routed rows (v2 only); see BloomV2.or_routed."""
        self._inner.or_routed(ibucket, idx, bucket_hash)

    def contains_routed(self, ibucket, idx, bucket_hash) -> np.ndarray:
        """Membership of pre-routed rows (v2 only); see BloomV2.contains_routed."""
        return self._inner.contains_routed(ibucket, idx, bucket_hash)

    def insert_packed_bulk(self, mat, lens) -> None:
        """OR-only bulk insert (no newness tracking / count update) — the
        distributed partial-build path; see BloomV2.insert_packed_bulk."""
        self._inner.insert_packed_bulk(mat, lens)

    def fill(self, keys) -> None:
        self._inner.insert_batch(list(keys))

    def contains_bytes(self, key) -> bool:
        return self._inner.contains_bytes(_as_bytes(key))

    contains_str = contains_bytes

    def contains_batch(self, keys) -> np.ndarray:
        return self._inner.contains_batch(keys)

    def contains_packed(self, mat, lens) -> np.ndarray:
        return self._inner.contains_packed(mat, lens)

    # --- merge algebra ----------------------------------------------------------------
    def has_same_params(self, other: "BloomFilter") -> bool:
        return self.version == other.version and self._inner.has_same_params(other._inner)

    def union_merge(self, other: "BloomFilter") -> None:
        if not self.has_same_params(other):
            raise MergeError("cannot merge filters with different parameters")
        self._inner.union_merge(other._inner)

    def intersection_merge(self, other: "BloomFilter") -> None:
        if self.version != 2 or other.version != 2:
            raise MergeError("intersection is only supported by v2 filters")
        self._inner.intersection_merge(other._inner)

    def count_common_entries(self, other: "BloomFilter") -> int:
        if not self.has_same_params(other):
            raise MergeError("cannot compare filters with different parameters")
        return self._inner.count_common_entries(other._inner)

    def clear(self) -> None:
        self._inner.clear()

    def update_count(self) -> None:
        self._inner.update_count()

    # --- metadata ------------------------------------------------------------------------
    @property
    def version(self) -> int:
        return self._inner.version

    @property
    def capacity(self) -> int:
        return self._inner.capacity

    @property
    def fpp(self) -> float:
        return self._inner.fpp

    @property
    def count_estimate(self) -> int:
        return self._inner.count_estimate()

    @property
    def data(self) -> bytes:
        return self._inner.data

    @data.setter
    def data(self, value: bytes) -> None:
        self._inner.data = bytes(value)

    def is_full(self) -> bool:
        return self._inner.is_full()

    def size_in_bytes(self) -> int:
        return self._inner.size_in_bytes()

    def estimated_p(self) -> float:
        return self._inner.estimated_p()

    # --- serialization -----------------------------------------------------------------------
    def dumps(self) -> bytes:
        return self._inner.dumps()

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.dumps())

    def info(self) -> dict:
        """Metadata summary (the CLI ``show`` analog, ``bin/poppy.rs:153-176``)."""
        return {
            "version": self.version,
            "capacity": self.capacity,
            "fpp": self.fpp,
            "count_estimate": self.count_estimate,
            "size_in_bytes": self.size_in_bytes(),
            "data_len": len(self.data),
        }


def _as_bytes(key) -> bytes:
    return key.encode("utf-8") if isinstance(key, str) else bytes(key)


def loads(raw: bytes, partial: bool = False) -> BloomFilter:
    """Deserialize any poppy filter, dispatching on the version flag byte
    (``poppy/src/bloom.rs:238-273``)."""
    if len(raw) < 8:
        raise PoppyError("truncated filter: missing flags header")
    version = raw[0]
    if version == 1:
        return BloomFilter._wrap(BloomV1.loads(raw, partial=partial))
    if version == 2:
        return BloomFilter._wrap(BloomV2.loads(raw, partial=partial))
    raise InvalidVersion(f"invalid version {version}")


def load(path: str, partial: bool = False) -> BloomFilter:
    with open(path, "rb") as f:
        return loads(f.read(), partial=partial)
