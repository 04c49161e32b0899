"""Scalar reference hashes: FNV-1 64-bit and wyhash (crate 0.5.0 lineage).

These pure-Python implementations are the *oracles* for the vectorized numpy
kernels in :mod:`poppy_spark.core.hashkern`.  Semantics derive from the public
reference behavior (hashlookup/poppy):

* FNV-1 (multiply-then-XOR), offset/prime per ``poppy/src/hash/fnv.rs:5-6``;
  golden vectors from ``poppy/src/hash/fnv.rs:72-78``.
* wyhash seeded with ``0x706f707079533d42`` (``b"poppyS=B"`` LE) per
  ``poppy/src/hash/wyhash.rs:8``.  The algorithm reconstruction below
  reproduces the reference golden vector
  ``wyhash("poppy") == 16507271990128044474`` (``wyhash.rs:44-48``).
  The <=8-byte tail arm, the composed exact-length read and the finalizer are
  anchored by that vector; the longer-input arms follow the same published
  wyhash structure (32-byte P1..P4 mum tree) and are frozen by this library's
  own golden vectors (see ``tests/test_hashes.py``).
* keys of length <= 8 bytes bypass hashing entirely in poppy's v2 pipeline
  (LE zero-padded u64 identity, ``poppy/src/hash.rs:52-63``) — that shortcut
  lives in :func:`hash_pop`, not here.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

# --- FNV-1 64-bit -----------------------------------------------------------
FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211


def fnv1_64(data: bytes) -> int:
    """FNV-1 (multiply first, then xor) over ``data``."""
    h = FNV_OFFSET
    for b in data:
        h = ((h * FNV_PRIME) & MASK64) ^ b
    return h


# --- wyhash ------------------------------------------------------------------
WYHASH_P0 = 0xA0761D6478BD642F
WYHASH_P1 = 0xE7037ED1A0B428DB
WYHASH_P2 = 0x8EBC6AF09C88C6E3
WYHASH_P3 = 0x589965CC75374CC3
WYHASH_P4 = 0x1D8E4E27C47D124F
WYHASH_P5 = 0xEB44ACCAB455D165

#: poppy's wyhash seed, ``b"poppyS=B"`` little-endian
#: (``poppy/src/hash/wyhash.rs:8``).
POPPY_SEED = 0x706F707079533D42


def _mum(a: int, b: int) -> int:
    r = (a & MASK64) * (b & MASK64)
    return ((r >> 64) ^ r) & MASK64


def _le(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _read_rest(b: bytes) -> int:
    """Exact-length composed read for 1..=8 trailing bytes."""
    n = len(b)
    if n == 1:
        return b[0]
    if n == 2:
        return _le(b)
    if n == 3:
        return (_le(b[:2]) << 8) | b[2]
    if n == 4:
        return _le(b)
    if n == 5:
        return (_le(b[:4]) << 8) | b[4]
    if n == 6:
        return (_le(b[:4]) << 16) | _le(b[4:6])
    if n == 7:
        return (_le(b[:4]) << 24) | (_le(b[4:6]) << 8) | b[6]
    return _le(b)


def wyhash(data: bytes, seed: int = POPPY_SEED) -> int:
    """wyhash of ``data`` with ``seed`` (validated on the poppy golden vector)."""
    n = len(data)
    seed &= MASK64
    nchunks = n // 32
    for c in range(nchunks):
        o = c * 32
        seed = _mum(
            seed ^ WYHASH_P0,
            _mum(_le(data[o : o + 8]) ^ WYHASH_P1, _le(data[o + 8 : o + 16]) ^ WYHASH_P2)
            ^ _mum(
                _le(data[o + 16 : o + 24]) ^ WYHASH_P3,
                _le(data[o + 24 : o + 32]) ^ WYHASH_P4,
            ),
        )
    rest = data[nchunks * 32 :]
    r = len(rest)
    if r == 0:
        pass
    elif r <= 8:
        seed = _mum(seed ^ WYHASH_P0, _read_rest(rest) ^ WYHASH_P1)
    elif r <= 16:
        seed = _mum(
            seed ^ WYHASH_P0,
            _mum(_le(rest[:8]) ^ WYHASH_P1, _read_rest(rest[8:]) ^ WYHASH_P2),
        )
    elif r <= 24:
        seed = _mum(
            seed ^ WYHASH_P0,
            _mum(_le(rest[:8]) ^ WYHASH_P1, _le(rest[8:16]) ^ WYHASH_P2)
            ^ _mum(_read_rest(rest[16:]) ^ WYHASH_P3, WYHASH_P4),
        )
    else:
        seed = _mum(
            seed ^ WYHASH_P0,
            _mum(_le(rest[:8]) ^ WYHASH_P1, _le(rest[8:16]) ^ WYHASH_P2)
            ^ _mum(_le(rest[16:24]) ^ WYHASH_P3, _read_rest(rest[24:]) ^ WYHASH_P4),
        )
    return _mum(seed, n ^ WYHASH_P5)


def hash_pop(data: bytes) -> int:
    """poppy's typed-key hash: identity for <=8 bytes, wyhash otherwise.

    Mirrors ``poppy/src/hash.rs:52-63`` — byte keys not longer than a u64 are
    interpreted as a little-endian zero-padded u64 *without hashing*.
    """
    if len(data) <= 8:
        return _le(data)
    return wyhash(data, POPPY_SEED)


def xorshift_star(seed: int) -> int:
    """xorshift64* randomizer used for v2 bucket selection
    (``poppy/src/bloom/v2.rs:31-36``)."""
    seed &= MASK64
    seed ^= (seed << 12) & MASK64
    seed ^= seed >> 25
    seed ^= (seed << 27) & MASK64
    return (seed * 2685821657736338717) & MASK64


# --- v1 fingerprint sequence --------------------------------------------------
#: largest prime < 2^64 (``poppy/src/bloom/v1.rs:21``)
V1_M = 18446744073709551557
#: multiplier with a very large primitive root (``poppy/src/bloom/v1.rs:26``)
V1_G = 18446744073709550147


def v1_indexes(data: bytes, k: int, m: int) -> list[int]:
    """The k bit indexes of poppy v1 (DCSO-compatible) for ``data``.

    h0 = FNV1(data) mod M; h_i = wrapping_mul64(h_{i-1}, G) mod M;
    index_i = h_i mod m (``poppy/src/bloom/v1.rs:36-66``).  Note the multiply
    *wraps at 64 bits first* (``v1.rs:61`` uses ``wrapping_mul`` then ``% M``)
    — it is NOT a 128-bit modular multiply.  Golden sequence: key ``"bar"``,
    k=7, m=958505 -> [20311, 36825, 412501, 835777, 658914, 853361, 307361]
    (``v1.rs:456-470``, copied from DCSO Go ``bloom_test.go``).
    """
    h = fnv1_64(data) % V1_M
    out = []
    for _ in range(k):
        h = ((h * V1_G) & MASK64) % V1_M
        out.append(h % m)
    return out


def v2_indexes(data: bytes, k: int) -> tuple[int, list[int]]:
    """poppy v2 double-hashing: returns (bucket_hash, [k bit indexes in 0..32768)).

    Mirrors ``poppy/src/bloom/v2.rs:19-121``: h1 = hash_pop(data); first index
    is ``h1 & 32767``; at i==1, h2 = wyhash(h1 big-endian bytes); then
    h1 += h2; h2 += i per step.  The bucket hash is ``xorshift_star(h1)`` of
    the *original* h1 (``v2.rs:50-54``).
    """
    h1 = hash_pop(data)
    bucket_hash = xorshift_star(h1)
    idx = []
    h2 = 0
    for i in range(k):
        if i > 0:
            if i == 1:
                h2 = wyhash(h1.to_bytes(8, "big"), POPPY_SEED)
            h1 = (h1 + h2) & MASK64
            h2 = (h2 + i) & MASK64
        idx.append(h1 & 32767)
    return bucket_hash, idx
