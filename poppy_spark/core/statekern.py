"""Batch bitset/state kernels for poppy-compatible Bloom filters.

These operate on the raw numpy state arrays (v1: little-endian u64 words,
v2: ``(n_buckets, 4096)`` uint8 buckets) and reproduce the reference's
*sequential* insert semantics exactly while staying fully vectorized:

* a key is "new" iff at least one of its k bits was unset at the moment the
  key was processed (``poppy/src/bloom/v1.rs:253-294``, ``v2.rs:358-412``);
* ``count`` increments once per new key;
* inserting a new key while ``count == capacity`` raises TooManyEntries
  (checked per key, in batch order — we pre-check instead of the reference's
  partial-write-then-error, a documented deviation).

The first-occurrence trick: flatten the (key, bit) pairs in key order; a pair
sets a new bit iff the bit is unset in the pre-batch state AND this flat
position is the first occurrence of that bit id in the batch.  That is exactly
what a sequential per-key loop would observe.
"""

from __future__ import annotations

import math

import numpy as np

from .params import TooManyEntries

U64 = np.uint64
U8 = np.uint8

#: per-byte popcount lookup (numpy 1.26 has no bitwise_count)
POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

BUCKET_SIZE = 4096  # bytes per v2 bucket (poppy/src/bloom/v2.rs:125)
BUCKET_BITS = BUCKET_SIZE * 8  # 32768

#: filters below this byte size use uint32 bit-id math in the batch
#: kernels (half the memory traffic); larger ones fall back to uint64.
#: Module-level so tests can patch it to exercise both branches.
U32_BYTES_LIMIT = 1 << 29


def popcount(arr: np.ndarray) -> int:
    return int(POP8[arr.view(U8)].sum(dtype=np.int64))


def rust_f64_as_u64(x: float) -> int:
    """Rust ``as u64`` cast semantics: truncate; NaN -> 0; saturate."""
    if math.isnan(x) or x <= 0.0:
        return 0
    if x >= 2.0**64:
        return (1 << 64) - 1
    return int(x)


def count_estimate_from_ones(bit_len: int, ones: int, n_hash: int) -> int:
    """N ~= -m/k * ln(1 - X/m)  (``poppy/src/bloom/v1.rs:330-334``)."""
    if bit_len == 0 or n_hash == 0:
        return 0
    if ones >= bit_len:
        # fully saturated filter: ln(0) = -inf; Rust's `as u64` on +inf
        # saturates to u64::MAX rather than erroring
        return rust_f64_as_u64(float("inf"))
    return rust_f64_as_u64(-(bit_len * math.log(1.0 - ones / bit_len)) / n_hash)


def _first_occurrence_new(
    pre_set: np.ndarray, bit_ids: np.ndarray, n: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-key 'sets at least one new bit' flags under sequential semantics,
    plus the sorted unique global bit ids (reused for the OR-scatter).

    ``pre_set``/``bit_ids`` are flat (n*k,): pre-batch bit values and global
    bit ids in key-major order.
    """
    import pandas as pd

    flat_ids = bit_ids.reshape(-1)
    # hash-table first-occurrence (no sort): True at the first position of
    # each distinct bit id, in batch order
    first = ~pd.Series(flat_ids).duplicated().to_numpy()
    newbit = (~pre_set.reshape(-1)) & first
    new_bits = flat_ids[newbit]  # unique bit ids that flip 0 -> 1
    return newbit.reshape(n, k).any(axis=1), new_bits


def _or_scatter_bits(dest_bytes: np.ndarray, uniq_bits: np.ndarray) -> None:
    """OR global bit ids (duplicates allowed) into a byte array via
    ``np.bitwise_or.at`` — measured 2.3x faster than the 8-way
    position-split fancy-OR it replaces (0.43s vs 0.99s for 20M ids into a
    3.6MB filter on this numpy build), because the split pays 8 full-array
    mask+gather passes while ``.at`` makes one pass."""
    if uniq_bits.size == 0:
        return
    byte_ids = (uniq_bits >> 3).astype(np.int64, copy=False)
    vals = np.uint8(1) << (uniq_bits & 7).astype(U8)
    np.bitwise_or.at(dest_bytes, byte_ids, vals)


def _check_capacity(new_per_key: np.ndarray, count: int, capacity: int) -> None:
    if capacity == 0 and new_per_key.shape[0] > 0:
        raise TooManyEntries("too many entries, false positive rate cannot be met")
    prev_counts = count + np.cumsum(new_per_key) - new_per_key
    if bool((new_per_key & (prev_counts >= capacity)).any()):
        raise TooManyEntries("too many entries, false positive rate cannot be met")


# --- v2 (bucketed) -------------------------------------------------------------


def v2_or_batch(
    buckets: np.ndarray,
    cache: np.ndarray | None,
    ibucket: np.ndarray,
    idx: np.ndarray,
    bucket_hash: np.ndarray,
) -> None:
    """OR a batch's bits into a v2 state without newness tracking — the bulk
    path for distributed partial builds (count is re-estimated at merge)."""
    if idx.shape[0] == 0:
        return
    if buckets.size < U32_BYTES_LIMIT:
        # filter < 512 MB: all bit ids fit uint32 — half the index-math
        # memory traffic of the u64 formulation (measured 1.5x on 20M ids)
        flat = (
            (ibucket.astype(np.uint32) * np.uint32(BUCKET_BITS))[:, None]
            + idx.astype(np.uint32)
        ).reshape(-1)
        vals = np.uint8(1) << (flat & np.uint32(7)).astype(U8)
        np.bitwise_or.at(buckets, flat >> np.uint32(3), vals)
    else:
        bit_ids = (
            (ibucket.astype(U64) * U64(BUCKET_BITS))[:, None] + idx.astype(U64)
        ).reshape(-1)
        _or_scatter_bits(buckets, bit_ids)
    if cache is not None and cache.size:
        cbits = U64(cache.size * 8)
        _or_scatter_bits(cache, bucket_hash.astype(U64) & (cbits - U64(1)))


def v2_insert_batch(
    buckets: np.ndarray,
    cache: np.ndarray | None,
    ibucket: np.ndarray,
    idx: np.ndarray,
    bucket_hash: np.ndarray,
    count: int,
    capacity: int,
) -> tuple[int, np.ndarray]:
    """Insert a batch into a v2 state; returns ``(new_count, new_per_key)``.

    ``buckets`` is the flat ``n_buckets * 4096`` uint8 array (modified in
    place), ``idx`` the (n, k) in-bucket bit indexes, ``ibucket`` the (n,)
    bucket selectors, ``bucket_hash`` the xorshift* hashes for the optional
    index cache.
    """
    n, k_ = idx.shape
    if n == 0:
        return count, np.zeros(0, dtype=bool)
    # all index math in unsigned ints (16x faster than int64 broadcasts on
    # some numpy builds); uint32 when the filter is < 512 MB — half the
    # memory traffic of u64
    if buckets.size < U32_BYTES_LIMIT:
        bit_ids = (
            (ibucket.astype(np.uint32) * np.uint32(BUCKET_BITS))[:, None]
            + idx.astype(np.uint32)
        ).reshape(-1)
        byte_off = bit_ids >> np.uint32(3)
        bitmask = np.uint8(1) << (bit_ids & np.uint32(7)).astype(U8)
    else:
        bit_ids = (
            (ibucket.astype(U64) * U64(BUCKET_BITS))[:, None] + idx.astype(U64)
        ).reshape(-1)
        byte_off = (bit_ids >> U64(3)).astype(np.int64)
        bitmask = (np.uint8(1) << (bit_ids & U64(7)).astype(U8)).astype(U8)
    pre_set = (buckets[byte_off] & bitmask) != 0
    new_per_key, new_bits = _first_occurrence_new(pre_set, bit_ids, n, k_)
    _check_capacity(new_per_key, count, capacity)
    _or_scatter_bits(buckets, new_bits)
    if cache is not None and cache.size:
        cbits = U64(cache.size * 8)
        cidx = np.unique(bucket_hash.astype(U64) & (cbits - U64(1)))
        _or_scatter_bits(cache, cidx)
    return count + int(new_per_key.sum()), new_per_key


def v2_contains_batch(
    buckets: np.ndarray,
    cache: np.ndarray | None,
    ibucket: np.ndarray,
    idx: np.ndarray,
    bucket_hash: np.ndarray,
    capacity: int,
) -> np.ndarray:
    """Membership for a batch against a v2 state -> bool (n,)."""
    n, k_ = idx.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if capacity == 0:
        return np.zeros(n, dtype=bool)
    if buckets.size < U32_BYTES_LIMIT:
        # filter < 512 MB: uint32 index math (see v2_or_batch)
        flat = (
            (ibucket.astype(np.uint32) * np.uint32(BUCKET_BITS))[:, None]
            + idx.astype(np.uint32)
        ).reshape(-1)
        byte_off = flat >> np.uint32(3)
        bitmask = np.uint8(1) << (flat & np.uint32(7)).astype(U8)
    else:
        bit_ids = (ibucket.astype(U64) * U64(BUCKET_BITS))[:, None] + idx.astype(U64)
        flat = bit_ids.reshape(-1)
        byte_off = (flat >> U64(3)).astype(np.int64)
        bitmask = (np.uint8(1) << (flat & U64(7)).astype(U8)).astype(U8)
    hit = ((buckets[byte_off] & bitmask) != 0).reshape(n, k_).all(axis=1)
    if cache is not None and cache.size:
        cbits = U64(cache.size * 8)
        cidx = bucket_hash.astype(U64) & (cbits - U64(1))
        cbyte = (cidx >> U64(3)).astype(np.int64)
        in_cache = (cache[cbyte] & (np.uint8(1) << (cidx & U64(7)).astype(U8))) != 0
        hit &= in_cache
    return hit


def v2_bucket_ones(buckets: np.ndarray, n_buckets: int) -> np.ndarray:
    """Per-bucket popcounts -> (n_buckets,) int64."""
    return (
        POP8[buckets.reshape(n_buckets, BUCKET_SIZE)]
        .sum(axis=1, dtype=np.int64)
        .astype(np.int64)
    )


def _sum_bucket_estimates(ones: np.ndarray, n_hash: int) -> int:
    """Sum per-bucket ``-m/k * ln(1 - X/m)`` with Rust ``as u64`` truncation
    applied to *each bucket* before summing (``poppy/src/bloom/v2.rs:575-588``)."""
    m = float(BUCKET_BITS)
    with np.errstate(divide="ignore"):
        est = -(m * np.log1p(-(ones / m))) / n_hash
    est = np.where(np.isnan(est) | (est <= 0.0), 0.0, est)
    saturated = est >= 2.0**64
    total = int(np.floor(est[~saturated]).astype(np.uint64).sum(dtype=np.object_))
    total += int(saturated.sum()) * ((1 << 64) - 1)
    return total


def v2_count_estimate(buckets: np.ndarray, n_buckets: int, n_hash: int) -> int:
    """Sum of per-bucket truncated estimates (``poppy/src/bloom/v2.rs:575-588``)."""
    if n_buckets == 0 or n_hash == 0:
        return 0
    return _sum_bucket_estimates(v2_bucket_ones(buckets, n_buckets), n_hash)


def v2_count_common(
    buckets_a: np.ndarray, buckets_b: np.ndarray, n_buckets: int, n_hash: int
) -> int:
    """Estimated common entries via per-bucket AND popcount
    (``poppy/src/bloom/v2.rs:555-573``)."""
    common = POP8[
        (buckets_a & buckets_b).reshape(n_buckets, BUCKET_SIZE)
    ].sum(axis=1, dtype=np.int64)
    return _sum_bucket_estimates(common, n_hash)


# --- v1 (flat u64-word bitset) ---------------------------------------------------


def v1_insert_batch(
    words: np.ndarray, idx: np.ndarray, count: int, capacity: int
) -> tuple[int, np.ndarray]:
    """Insert a batch into a v1 state (u64 word array, modified in place);
    returns ``(new_count, new_per_key)``."""
    n, k_ = idx.shape
    if n == 0:
        return count, np.zeros(0, dtype=bool)
    flat = idx.astype(U64).reshape(-1)
    byte_off = (flat >> U64(3)).astype(np.int64)
    bitmask = (np.uint8(1) << (flat & U64(7)).astype(U8)).astype(U8)
    wb = words.view(U8)
    pre_set = (wb[byte_off] & bitmask) != 0
    new_per_key, new_bits = _first_occurrence_new(pre_set, flat, n, k_)
    _check_capacity(new_per_key, count, capacity)
    # on the little-endian u64 word layout, global bit i lives in flat byte
    # i>>3 at in-byte position i&7 — identical to the byte-bitset order
    _or_scatter_bits(wb, new_bits)
    return count + int(new_per_key.sum()), new_per_key


def v1_contains_batch(words: np.ndarray, idx: np.ndarray) -> np.ndarray:
    n, k_ = idx.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if words.size == 0:
        return np.zeros(n, dtype=bool)
    flat = idx.astype(U64).reshape(-1)
    byte_off = (flat >> U64(3)).astype(np.int64)
    bitmask = (np.uint8(1) << (flat & U64(7)).astype(U8)).astype(U8)
    return ((words.view(U8)[byte_off] & bitmask) != 0).reshape(n, k_).all(axis=1)
