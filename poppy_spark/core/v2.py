"""poppy v2 Bloom filter (bucketed, wyhash-based), numpy-backed.

Wire format (all little-endian, ``poppy/src/bloom/v2.rs:253-279``)::

    flags[8] | capacity u64 | fpp f64 | n_hash_buck u64 | count u64
    | cache_bit_len u64 | cache bytes | n_buckets u64
    | buckets (4096 bytes each) | attached data ... EOF

Sizing per ``v2.rs:281-329``: each 4096-byte bucket is a small Bloom filter
holding ``cap_from_bit_size(32768, fpp)`` entries; keys route to buckets by
``xorshift_star(h1)``; within a bucket, k indexes come from wyhash-based
double hashing.  A partial-state serialization of this class is itself a
valid poppy v2 file, which is what our Spark partial aggregation shuffles.

Compatibility caveat: the wyhash >8-byte arms are reconstructed and frozen
by this library's own golden vectors — the reference publishes only one
vector (``"poppy"``, 5 bytes), so v2 files over keys *longer than 8 bytes*
are believed but not proven byte-compatible with Rust-built filters until
vectors from the wyhash 0.5.0 crate can be generated (no network here).
Keys <= 8 bytes (and the whole v1 format) are fully anchored.
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
    TooManyEntries,
    cap_from_bit_size,
    check_fpp,
    estimate_p,
    flags_bytes,
    k as k_fn,
    next_power_of_two,
    parse_flags,
)
from .statekern import BUCKET_BITS, BUCKET_SIZE

_HDR = struct.Struct("<QdQQ")  # capacity, fpp, n_hash_buck, count


class BloomV2:
    version = 2

    def __init__(
        self,
        capacity: int,
        fpp: float,
        n_hash_buck: int,
        n_buckets: int,
        cache_bits: int = 0,
        count: int = 0,
        buckets: np.ndarray | None = None,
        cache: np.ndarray | None = None,
        data: bytes = b"",
        opt: OptLevel = OptLevel.NONE,
        reserved: bytes = b"\0" * 6,
        partial: bool = False,
    ):
        self.capacity = capacity
        self.fpp = fpp
        self.n_hash_buck = n_hash_buck
        self.n_buckets = n_buckets
        self.count = count
        self.opt = opt
        self.reserved = reserved
        self.partial = partial
        cache_bytes = math.ceil(cache_bits / 8)
        if buckets is None and not partial:
            buckets = np.zeros(n_buckets * BUCKET_SIZE, dtype=np.uint8)
        self.buckets = buckets if buckets is not None else np.zeros(0, dtype=np.uint8)
        if cache is None and not partial:
            cache = np.zeros(cache_bytes, dtype=np.uint8)
        self.cache = cache if cache is not None else np.zeros(0, dtype=np.uint8)
        self.cache_byte_size = cache_bytes if partial else self.cache.size
        self.data = bytes(data)

    # --- construction ------------------------------------------------------------
    @classmethod
    def make(cls, capacity: int, fpp: float, opt: OptLevel = OptLevel.NONE) -> "BloomV2":
        check_fpp(fpp)
        bucket_cap = cap_from_bit_size(BUCKET_BITS, fpp)
        n_buckets = math.ceil(capacity / bucket_cap)
        n_hash_buck = k_fn(BUCKET_BITS, bucket_cap)
        cache_bits = 0
        bits_per_entry = round(BUCKET_BITS / bucket_cap)
        if opt in (OptLevel.SPEED, OptLevel.BEST):
            cache_bits = next_power_of_two(capacity)
            if opt is OptLevel.SPEED:
                n_buckets = next_power_of_two(n_buckets)
            n_hash_buck = math.ceil(
                math.log(2.0) * estimate_p(capacity, cache_bits) * bits_per_entry
            )
        return cls(capacity, fpp, n_hash_buck, n_buckets, cache_bits, opt=OptLevel(opt))

    @classmethod
    def with_capacity(cls, capacity: int, fpp: float) -> "BloomV2":
        return cls.make(capacity, fpp, OptLevel.NONE)

    @classmethod
    def from_params(cls, p: Params) -> "BloomV2":
        return cls.make(p.capacity, p.fpp, p.opt)

    # --- hashing -------------------------------------------------------------------
    def _route(self, mat: np.ndarray, lens: np.ndarray):
        """(ibucket, idx, bucket_hash) for a packed batch."""
        h1 = hk.hash_pop_batch(mat, lens)
        bucket_hash, idx = hk.v2_index_batch(h1, max(self.n_hash_buck, 1))
        if self.n_buckets and self.n_buckets & (self.n_buckets - 1) == 0:
            ibucket = bucket_hash & np.uint64(self.n_buckets - 1)
        elif self.n_buckets:
            ibucket = bucket_hash % np.uint64(self.n_buckets)
        else:
            ibucket = np.zeros_like(bucket_hash)
        return ibucket, idx[:, : self.n_hash_buck], bucket_hash

    # --- core ops --------------------------------------------------------------------
    def insert_packed(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        if self.capacity == 0 and mat.shape[0] > 0:
            raise TooManyEntries("too many entries, false positive rate cannot be met")
        ibucket, idx, bucket_hash = self._route(mat, lens)
        self.count, new = sk.v2_insert_batch(
            self.buckets,
            self.cache if self.cache.size else None,
            ibucket,
            idx,
            bucket_hash,
            self.count,
            self.capacity,
        )
        return new

    def insert_packed_bulk(self, mat: np.ndarray, lens: np.ndarray) -> None:
        """OR-only bulk insert: skips per-key newness tracking (a hash-table
        pass over n*k bit ids) and leaves ``count`` untouched.

        For distributed builds the sequential count is discarded anyway —
        the merge re-estimates from bucket popcounts exactly as poppy's
        ``union_merge`` does (``v2.rs:476-494``) — so the Spark update phase
        uses this path.  Deviation: a partition exceeding ``capacity`` no
        longer raises mid-insert; saturation shows up in the final
        ``count_estimate``/``is_full`` instead.
        """
        if self.capacity == 0 and mat.shape[0] > 0:
            raise TooManyEntries("too many entries, false positive rate cannot be met")
        ibucket, idx, bucket_hash = self._route(mat, lens)
        sk.v2_or_batch(
            self.buckets,
            self.cache if self.cache.size else None,
            ibucket,
            idx,
            bucket_hash,
        )

    def route_packed(self, mat: np.ndarray, lens: np.ndarray):
        """Hash-once routing for a packed batch: ``(ibucket, idx,
        bucket_hash)``.  Every filter built with the same params routes a
        key identically, so a grouped build can route one BATCH once and
        scatter per-group row slices into each group's filter with
        :meth:`or_routed` — the per-group cost drops from a full
        pack+hash+scatter call to one numpy scatter."""
        return self._route(mat, lens)

    def or_routed(self, ibucket, idx, bucket_hash) -> None:
        """OR-only scatter of pre-routed rows (see :meth:`route_packed`);
        the slice-wise counterpart of :meth:`insert_packed_bulk`, with the
        same discard-the-count semantics (merge re-estimates)."""
        if self.capacity == 0 and len(ibucket) > 0:
            raise TooManyEntries("too many entries, false positive rate cannot be met")
        sk.v2_or_batch(
            self.buckets,
            self.cache if self.cache.size else None,
            ibucket,
            idx,
            bucket_hash,
        )

    def contains_routed(self, ibucket, idx, bucket_hash) -> np.ndarray:
        """Membership for pre-routed rows (see :meth:`route_packed`): the
        grouped probe routes one batch once and tests each group's slice
        against that group's filter — same-params filters share routing."""
        return sk.v2_contains_batch(
            self.buckets,
            self.cache if self.cache.size else None,
            ibucket,
            idx,
            bucket_hash,
            self.capacity,
        )

    def insert_batch(self, keys) -> np.ndarray:
        return self.insert_packed(*hk.pack_keys(keys))

    def insert_bytes(self, key) -> bool:
        return bool(self.insert_batch([key])[0])

    def contains_packed(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        ibucket, idx, bucket_hash = self._route(mat, lens)
        return sk.v2_contains_batch(
            self.buckets,
            self.cache if self.cache.size else None,
            ibucket,
            idx,
            bucket_hash,
            self.capacity,
        )

    def contains_batch(self, keys) -> np.ndarray:
        return self.contains_packed(*hk.pack_keys(keys))

    def contains_bytes(self, key) -> bool:
        return bool(self.contains_batch([key])[0])

    def clear(self) -> None:
        self.buckets.fill(0)
        self.cache.fill(0)
        self.count = 0

    # --- metadata ---------------------------------------------------------------------
    def count_ones(self) -> int:
        return sk.popcount(self.buckets)

    def count_estimate(self) -> int:
        return self.count

    def update_count(self) -> None:
        self.count = sk.v2_count_estimate(self.buckets, self.n_buckets, self.n_hash_buck)

    def estimated_p(self) -> float:
        return estimate_p(max(self.count_estimate(), 1), self.n_buckets * BUCKET_BITS)

    def is_full(self) -> bool:
        return self.count_estimate() == self.capacity

    def size_in_bytes(self) -> int:
        return self.n_buckets * BUCKET_SIZE + self.cache_byte_size

    def has_same_params(self, other: "BloomV2") -> bool:
        return (
            isinstance(other, BloomV2)
            and self.opt == other.opt
            and self.reserved == other.reserved
            and self.capacity == other.capacity
            and self.cache_byte_size == other.cache_byte_size
            and self.fpp == other.fpp
            and self.n_hash_buck == other.n_hash_buck
            and self.n_buckets == other.n_buckets
        )

    # --- merges ------------------------------------------------------------------------
    def union_merge(self, other: "BloomV2") -> None:
        if not self.has_same_params(other):
            raise MergeError("cannot make union of bloom filters with different parameters")
        np.bitwise_or(self.buckets, other.buckets, out=self.buckets)
        if self.cache.size:
            np.bitwise_or(self.cache, other.cache, out=self.cache)
        self.update_count()

    def intersection_merge(self, other: "BloomV2") -> None:
        if not self.has_same_params(other):
            raise MergeError(
                "cannot make intersection of bloom filters with different parameters"
            )
        np.bitwise_and(self.buckets, other.buckets, out=self.buckets)
        if self.cache.size:
            np.bitwise_and(self.cache, other.cache, out=self.cache)
        self.update_count()

    def count_common_entries(self, other: "BloomV2") -> int:
        if not self.has_same_params(other):
            raise MergeError("cannot compare filters with different parameters")
        return sk.v2_count_common(
            self.buckets, other.buckets, self.n_buckets, self.n_hash_buck
        )

    # --- serialization ------------------------------------------------------------------
    def dumps(self) -> bytes:
        out = io.BytesIO()
        out.write(flags_bytes(2, self.opt))
        out.write(_HDR.pack(self.capacity, self.fpp, self.n_hash_buck, self.count))
        out.write(struct.pack("<Q", self.cache.size * 8))
        out.write(self.cache.tobytes())
        out.write(struct.pack("<Q", self.n_buckets))
        out.write(self.buckets.tobytes())
        out.write(self.data)
        return out.getvalue()

    @classmethod
    def loads(cls, raw: bytes, partial: bool = False) -> "BloomV2":
        version, opt, reserved = parse_flags(raw[:8])
        if version != 2:
            raise PoppyError(f"invalid version {version}")
        cap, fpp, n_hash_buck, count = _HDR.unpack_from(raw, 8)
        check_fpp(fpp)
        off = 8 + _HDR.size
        (cache_bits,) = struct.unpack_from("<Q", raw, off)
        off += 8
        cache_bytes = math.ceil(cache_bits / 8)
        cache = (
            None
            if partial
            else np.frombuffer(raw[off : off + cache_bytes], dtype=np.uint8).copy()
        )
        off += cache_bytes
        (n_buckets,) = struct.unpack_from("<Q", raw, off)
        off += 8
        nbytes = n_buckets * BUCKET_SIZE
        if partial:
            buckets = None
        else:
            if len(raw) < off + nbytes:
                raise PoppyError("truncated v2 filter")
            buckets = np.frombuffer(raw[off : off + nbytes], dtype=np.uint8).copy()
        data = raw[off + nbytes :]
        return cls(
            cap,
            fpp,
            n_hash_buck,
            n_buckets,
            cache_bits,
            count,
            buckets,
            cache,
            data,
            opt,
            reserved,
            partial=partial,
        )
