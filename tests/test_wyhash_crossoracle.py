"""Cross-oracle for the reconstructed wyhash: the library's implementation
(brute-forced from poppy's single golden vector, see
``poppy_spark/core/hashes.py``) must agree with an independent clean-room
transliteration of the published v1 algorithm (``tests/wyhash_clean.py``)
on EVERY arm — exhaustive tail lengths 0..=200 (covers all four tail arms
at 1..6 block counts), random fuzz up to 4 KiB, and the batch kernel.

This is the round-2 verdict's top item: before this module, the >8-byte
tail arms and the 32-byte loop were frozen only by self-golden vectors.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from poppy_spark.core.hashes import POPPY_SEED, wyhash
from poppy_spark.core.hashkern import pack_keys, wyhash_batch

from .wyhash_clean import wyhash_clean

GOLDEN = 16507271990128044474


def test_clean_room_reproduces_poppy_golden_vector():
    # the clean-room impl independently hits the reference's only published
    # vector (poppy/src/hash/wyhash.rs:44-48) — both lineages agree with Rust
    assert wyhash_clean(b"poppy", POPPY_SEED) == GOLDEN
    assert wyhash(b"poppy", POPPY_SEED) == GOLDEN


def test_exhaustive_lengths_0_to_200():
    rng = random.Random(0xB10B)
    for n in range(201):
        data = bytes(rng.getrandbits(8) for _ in range(n))
        assert wyhash(data, POPPY_SEED) == wyhash_clean(data, POPPY_SEED), (
            f"arm mismatch at len={n}"
        )


def test_exhaustive_lengths_multiple_seeds():
    rng = random.Random(7)
    seeds = [0, 1, POPPY_SEED, 0xFFFFFFFFFFFFFFFF, 0xDEADBEEFCAFEF00D]
    for seed in seeds:
        for n in [0, 1, 7, 8, 9, 15, 16, 17, 23, 24, 25, 31, 32, 33, 63, 64, 65]:
            data = bytes(rng.getrandbits(8) for _ in range(n))
            assert wyhash(data, seed) == wyhash_clean(data, seed), (
                f"mismatch at len={n} seed={seed:#x}"
            )


def test_random_fuzz_long_inputs():
    rng = random.Random(0x5EED)
    for _ in range(300):
        n = rng.randint(0, 4096)
        data = rng.randbytes(n)
        assert wyhash(data, POPPY_SEED) == wyhash_clean(data, POPPY_SEED)


def test_batch_kernel_agrees_with_clean_room():
    rng = random.Random(42)
    keys = [rng.randbytes(rng.randint(0, 130)) for _ in range(500)]
    mat, lens = pack_keys(keys)
    got = wyhash_batch(mat, lens, POPPY_SEED)
    want = np.array([wyhash_clean(k, POPPY_SEED) for k in keys], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_boundary_bytes_all_same():
    # degenerate inputs (all 0x00 / all 0xFF) at every arm boundary
    for n in [0, 1, 8, 9, 16, 17, 24, 25, 31, 32, 33, 40, 64, 96]:
        for b in (0x00, 0xFF, 0x80):
            data = bytes([b]) * n
            assert wyhash(data, POPPY_SEED) == wyhash_clean(data, POPPY_SEED)


@pytest.mark.parametrize("n", [5, 12, 20, 28, 37])
def test_hypothesis_style_bitflip_sensitivity(n):
    # both implementations must move identically under single-bit flips
    rng = random.Random(n)
    base = rng.randbytes(n)
    h0 = wyhash(base, POPPY_SEED)
    assert h0 == wyhash_clean(base, POPPY_SEED)
    for i in range(n):
        mutated = bytearray(base)
        mutated[i] ^= 1 << (i % 8)
        m = bytes(mutated)
        assert wyhash(m, POPPY_SEED) == wyhash_clean(m, POPPY_SEED) != h0
