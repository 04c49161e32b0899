"""Golden-vector and batch==scalar tests for the hash pipeline.

Golden vectors are the reference's own cross-implementation fixtures:
FNV-1 (``poppy/src/hash/fnv.rs:72-78``), wyhash seeded ``b"poppyS=B"``
(``poppy/src/hash/wyhash.rs:44-48``), the v1 fingerprint sequence copied from
DCSO Go (``poppy/src/bloom/v1.rs:456-470``).
"""

import random

import numpy as np
import pytest

from poppy_spark.core import hashkern as hk
from poppy_spark.core.hashes import (
    POPPY_SEED,
    fnv1_64,
    hash_pop,
    v1_indexes,
    v2_indexes,
    wyhash,
    xorshift_star,
)

# (len, wyhash(poppy seed), fnv1) for data = bytes((i*31+7) & 0xff), frozen to
# pin this library's hash outputs (covers every tail-arm boundary).
SELF_GOLDENS = [
    (0, 2494106353260950696, 14695981039346656037),
    (1, 16720198733474482776, 12638153115695167448),
    (2, 7775256608619546308, 590676371239035950),
    (3, 9357711560812093236, 15651537131165923951),
    (4, 191921637169035607, 1226248482602633977),
    (5, 13392585359891532281, 14912746161888257432),
    (6, 16912014420652216196, 10752797172958077418),
    (7, 11805843928807273473, 10269921563104649311),
    (8, 7303769207295787262, 2880580201442771341),
    (9, 17215321424192614802, 17481259165371441768),
    (12, 5234090876313201719, 13764165296092799873),
    (16, 12139035385737128434, 12215992279990510965),
    (17, 18231513773162386732, 15103921042783348024),
    (24, 5745284298418942406, 2198710765337536541),
    (25, 18425905390809077303, 11433142397818628520),
    (31, 6821726823584276069, 13265766756958911679),
    (32, 8230334264749966651, 10089368811358173253),
    (33, 11159872344954974419, 15319572476748439000),
    (40, 7951063725137729169, 15233721456113216685),
    (64, 5296634332433892951, 12749389079218545253),
    (65, 2639705597964796550, 13177673247219560792),
    (100, 13320577786373158198, 13210924498396015257),
]

LENGTHS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 15, 16, 17, 23, 24, 25, 31, 32, 33, 40, 63, 64, 65, 100, 200, 400]


def _random_keys(n=2000, seed=42):
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(rng.choice(LENGTHS))) for _ in range(n)]


class TestGoldenVectors:
    def test_fnv1_reference_vectors(self):
        assert fnv1_64(b"Hello, World!") == 8889723880822884486
        assert fnv1_64(b"Let's rustify all this") == 13581150826273240441

    def test_wyhash_poppy_vector(self):
        assert wyhash(b"poppy", POPPY_SEED) == 16507271990128044474

    def test_v1_fingerprint_dcso_sequence(self):
        assert v1_indexes(b"bar", 7, 958505) == [
            20311, 36825, 412501, 835777, 658914, 853361, 307361,
        ]

    def test_self_goldens_frozen(self):
        for n, wy, fv in SELF_GOLDENS:
            data = bytes((i * 31 + 7) & 0xFF for i in range(n))
            assert wyhash(data) == wy, n
            assert fnv1_64(data) == fv, n

    def test_hash_pop_short_key_identity(self):
        # <=8 bytes: LE zero-padded u64, no hashing (poppy/src/hash.rs:52-63)
        assert hash_pop(b"user") == int.from_bytes(b"user", "little")
        assert hash_pop(b"") == 0
        assert hash_pop(b"\x01") == 1
        assert hash_pop(b"12345678") == int.from_bytes(b"12345678", "little")
        assert hash_pop(b"123456789") == wyhash(b"123456789", POPPY_SEED)


class TestBatchEqualsScalar:
    def test_fnv1_batch(self):
        keys = _random_keys()
        mat, lens = hk.pack_keys(keys)
        out = hk.fnv1_batch(mat, lens)
        assert [int(x) for x in out] == [fnv1_64(k) for k in keys]

    def test_wyhash_batch(self):
        keys = _random_keys(seed=7)
        mat, lens = hk.pack_keys(keys)
        out = hk.wyhash_batch(mat, lens)
        assert [int(x) for x in out] == [wyhash(k) for k in keys]

    def test_hash_pop_batch(self):
        keys = _random_keys(seed=11)
        mat, lens = hk.pack_keys(keys)
        out = hk.hash_pop_batch(mat, lens)
        assert [int(x) for x in out] == [hash_pop(k) for k in keys]

    def test_v2_index_batch(self):
        keys = _random_keys(n=400, seed=13)
        mat, lens = hk.pack_keys(keys)
        h1 = hk.hash_pop_batch(mat, lens)
        bh, idx = hk.v2_index_batch(h1, 13)
        for i, key in enumerate(keys):
            sb, si = v2_indexes(key, 13)
            assert int(bh[i]) == sb
            assert [int(x) for x in idx[i]] == si

    def test_v1_index_batch(self):
        keys = _random_keys(n=400, seed=17)
        mat, lens = hk.pack_keys(keys)
        idx = hk.v1_index_batch(hk.fnv1_batch(mat, lens), 7, 958505)
        for i, key in enumerate(keys):
            assert [int(x) for x in idx[i]] == v1_indexes(key, 7, 958505)

    def test_xorshift_batch(self):
        vals = np.array([1, 42, 2**63, 2**64 - 1, 977], dtype=np.uint64)
        out = hk.xorshift_star_batch(vals)
        assert [int(x) for x in out] == [xorshift_star(int(v)) for v in vals]

    def test_wyhash_u64be_batch(self):
        vals = np.array([0, 1, 42, 2**64 - 1, 0x0123456789ABCDEF], dtype=np.uint64)
        out = hk.wyhash_u64be_batch(vals)
        assert [int(x) for x in out] == [
            wyhash(int(v).to_bytes(8, "big"), POPPY_SEED) for v in vals
        ]


class TestPackArrow:
    def test_pack_arrow_matches_pack_keys(self):
        pa = pytest.importorskip("pyarrow")
        strs = ["", "a", "user", "tool", "x" * 50, "héllo wörld", "poppy"]
        arr = pa.array(strs, type=pa.string())
        m1, l1 = hk.pack_arrow(arr)
        m2, l2 = hk.pack_keys(strs)
        assert list(l1) == list(l2)
        h1 = hk.hash_pop_batch(m1, l1)
        h2 = hk.hash_pop_batch(m2, l2)
        assert list(h1) == list(h2)

    def test_pack_arrow_sliced_and_null(self):
        pa = pytest.importorskip("pyarrow")
        arr = pa.array(["drop", "keep1", None, "keep2"], type=pa.string())
        sliced = arr.slice(1)
        mat, lens = hk.pack_arrow(sliced)
        assert list(lens) == [5, 0, 5]
        h = hk.hash_pop_batch(mat, lens)
        assert int(h[0]) == hash_pop(b"keep1")
        assert int(h[1]) == hash_pop(b"")
        assert int(h[2]) == hash_pop(b"keep2")

    def test_pack_arrow_large_string(self):
        pa = pytest.importorskip("pyarrow")
        arr = pa.array(["abc", "defghij"], type=pa.large_string())
        mat, lens = hk.pack_arrow(arr)
        h = hk.hash_pop_batch(mat, lens)
        assert int(h[0]) == hash_pop(b"abc")
        assert int(h[1]) == hash_pop(b"defghij")


class TestIntKeyPath:
    """poppy typed-key semantics for integers (``poppy/src/hash.rs:44-50``):
    an int hashes as its 8 little-endian bytes; being <= 8 bytes, the v2
    identity shortcut makes hash_pop(k) == k as u64."""

    def test_hash_pop_int_identity(self):
        from poppy_spark.core.hashes import hash_pop

        for k in (0, 1, 1234, 2**40 + 7, 2**63 - 1):
            assert hash_pop(k.to_bytes(8, "little")) == k

    def test_pack_int64_le_equals_manual_bytes(self):
        import numpy as np

        from poppy_spark.core.hashkern import (
            fnv1_batch, hash_pop_batch, pack_int64_le, pack_keys,
        )

        vals = np.array([0, 1, 1234, -5, 2**40 + 7, -(2**62)], dtype=np.int64)
        mat_i, lens_i = pack_int64_le(vals)
        manual = [int(v).to_bytes(8, "little", signed=v < 0) for v in vals]
        mat_b, lens_b = pack_keys(manual)
        assert (hash_pop_batch(mat_i, lens_i) == hash_pop_batch(mat_b, lens_b)).all()
        assert (fnv1_batch(mat_i, lens_i) == fnv1_batch(mat_b, lens_b)).all()
        # v2 identity: non-negative ints hash to themselves
        h = hash_pop_batch(mat_i, lens_i)
        assert h[2] == 1234 and h[0] == 0

    def test_int_filter_equals_le_bytes_filter(self):
        """A filter built over int keys is byte-identical to one built over
        the same keys' LE byte encodings (both v1 and v2) — the Rust
        cross-compat contract."""
        from poppy_spark.core import BloomFilter

        keys = list(range(0, 5000, 3))
        as_bytes = [k.to_bytes(8, "little") for k in keys]
        for version in (1, 2):
            fi = BloomFilter.with_version(version, len(keys), 0.001)
            fi.insert_batch(keys)
            fb = BloomFilter.with_version(version, len(keys), 0.001)
            fb.insert_batch(as_bytes)
            assert fi.dumps() == fb.dumps(), f"v{version} int/bytes mismatch"
            assert all(fi.contains_batch(keys))


class TestPackArrowPaths:
    def test_uniform_and_varied_paths_agree(self):
        """The uniform-length reshape fast path and the general scatter
        produce identical matrices for the same logical keys."""
        import numpy as np
        import pyarrow as pa

        from poppy_spark.core import hashkern as hk

        uni = [f"key-{i:06d}" for i in range(1000)]
        arr_u = pa.array(uni)
        mat_u, lens_u = hk.pack_arrow(arr_u)
        mat_k, lens_k = hk.pack_keys([s.encode() for s in uni])
        assert (lens_u == lens_k).all()
        assert mat_u[:, :10].tobytes() == mat_k[:, :10].tobytes()
        # a sliced uniform array (non-zero offset) also matches
        sl = arr_u.slice(100, 500)
        mat_s, lens_s = hk.pack_arrow(sl)
        assert mat_s[:, :10].tobytes() == mat_k[100:600, :10].tobytes()
        h_all = hk.hash_pop_batch(mat_u, lens_u)
        h_sl = hk.hash_pop_batch(mat_s, lens_s)
        assert (h_sl == h_all[100:600]).all()
