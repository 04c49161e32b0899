"""Accuracy-bound, merge-algebra and roundtrip tests for the sketch family.

Every sketch must satisfy: (a) its published error bound against exact numpy
ground truth, (b) merge(parts) == single build (exactly where the state
algebra is idempotent: HLL max, CMS add, MinHash min, Bloom or), (c)
serialization roundtrip, (d) merge commutativity.
"""

import collections

import numpy as np
import pytest

from poppy_spark.sketches import (
    BloomSketch,
    CmsSketch,
    HllSketch,
    KllSketch,
    MinHashSketch,
    TDigestSketch,
)


class TestHll:
    def test_estimate_within_bound(self):
        h = HllSketch(14)
        h.update_keys([f"user-{i}" for i in range(200000)])
        est = h.estimate()
        assert abs(est - 200000) / 200000 < 3 * h.relative_error()

    def test_small_range_linear_counting(self):
        h = HllSketch(12)
        h.update_keys([f"u{i}" for i in range(100)])
        assert h.result() == pytest.approx(100, abs=3)

    def test_merge_equals_single_build(self):
        keys = [f"user-{i}" for i in range(50000)]
        single = HllSketch(12)
        single.update_keys(keys)
        a, b = HllSketch(12), HllSketch(12)
        a.update_keys(keys[:30000])
        b.update_keys(keys[20000:])  # overlapping on purpose
        a.merge(b)
        assert a.dumps() == single.dumps()

    def test_merge_commutative(self):
        a1, a2 = HllSketch(10), HllSketch(10)
        b1, b2 = HllSketch(10), HllSketch(10)
        a1.update_keys(["x", "y"]); a2.update_keys(["z"])
        b1.update_keys(["z"]); b2.update_keys(["x", "y"])
        a1.merge(a2); b1.merge(b2)
        assert a1.dumps() == b1.dumps()

    def test_roundtrip(self):
        h = HllSketch(11)
        h.update_keys(["a", "b", "c"])
        r = HllSketch.loads(h.dumps())
        assert r.p == 11 and (r.registers == h.registers).all()

    def test_precision_mismatch(self):
        with pytest.raises(ValueError):
            HllSketch(10).merge(HllSketch(11))


class TestCms:
    def _data(self):
        rng = np.random.default_rng(42)
        zipf = rng.zipf(1.3, 100000)
        return [f"k{z}" for z in zipf[zipf < 5000]]

    def test_bounds(self):
        keys = self._data()
        c = CmsSketch(w=4096, d=5)
        c.update_keys(keys)
        true = collections.Counter(keys)
        qk = list(true.keys())
        est = c.query_keys(qk)
        n = len(keys)
        assert all(est[i] >= true[k] for i, k in enumerate(qk)), "CMS must never undercount"
        over = sum(1 for i, k in enumerate(qk) if est[i] > true[k] + c.eps * n)
        assert over <= max(2, 2 * c.delta * len(qk))

    def test_merge_equals_single(self):
        keys = self._data()
        c = CmsSketch(w=2048, d=4)
        c.update_keys(keys)
        a, b = CmsSketch(w=2048, d=4), CmsSketch(w=2048, d=4)
        a.update_keys(keys[:40000])
        b.update_keys(keys[40000:])
        a.merge(b)
        assert (a.table == c.table).all()
        assert a.total() == len(keys)

    def test_roundtrip(self):
        c = CmsSketch(w=512, d=3)
        c.update_keys(["a", "a", "b"])
        r = CmsSketch.loads(c.dumps())
        assert (r.table == c.table).all()
        assert r.query_keys(["a"])[0] == 2

    def test_from_error(self):
        c = CmsSketch.from_error(eps=0.001, delta=0.01)
        assert c.eps <= 0.001 and c.delta <= 0.01


class TestKll:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(7)
        vals = rng.normal(0, 1, 300000)
        sk = KllSketch(200)
        for chunk in np.array_split(vals, 30):
            sk.update_values(chunk)
        svals = np.sort(vals)
        for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
            true_rank = np.searchsorted(svals, sk.quantile(q)) / len(svals)
            assert abs(true_rank - q) < sk.eps(), q

    def test_merge_preserves_bound(self):
        rng = np.random.default_rng(8)
        vals = rng.exponential(2.0, 200000)
        parts = np.array_split(vals, 8)
        sk = KllSketch(200)
        others = []
        for p in parts:
            o = KllSketch(200)
            o.update_values(p)
            others.append(o)
        sk = others[0]
        for o in others[1:]:
            sk.merge(o)
        assert sk.n == len(vals)
        svals = np.sort(vals)
        for q in [0.1, 0.5, 0.9]:
            true_rank = np.searchsorted(svals, sk.quantile(q)) / len(svals)
            assert abs(true_rank - q) < sk.eps(), q

    def test_exact_when_small(self):
        sk = KllSketch(200)
        sk.update_values(np.arange(100, dtype=float))
        assert sk.quantile(0.0) == 0.0
        assert sk.quantile(1.0) == 99.0
        assert sk.quantile(0.5) == pytest.approx(50, abs=1)

    def test_roundtrip(self):
        sk = KllSketch(100)
        sk.update_values(np.random.default_rng(1).random(5000))
        r = KllSketch.loads(sk.dumps())
        assert r.n == sk.n and r.quantile(0.5) == sk.quantile(0.5)


class TestTDigest:
    def test_mid_and_tail_accuracy(self):
        rng = np.random.default_rng(9)
        vals = rng.normal(0, 1, 300000)
        td = TDigestSketch(200)
        for chunk in np.array_split(vals, 30):
            td.update_values(chunk)
        svals = np.sort(vals)
        for q in [0.1, 0.5, 0.9]:
            tr = np.searchsorted(svals, td.quantile(q)) / len(svals)
            assert abs(tr - q) < 0.01, q
        for q in [0.001, 0.999]:
            tr = np.searchsorted(svals, td.quantile(q)) / len(svals)
            assert abs(tr - q) < 0.5 * min(q, 1 - q) + 1e-4, q

    def test_merge(self):
        rng = np.random.default_rng(10)
        vals = rng.random(100000)
        a, b = TDigestSketch(100), TDigestSketch(100)
        a.update_values(vals[:50000])
        b.update_values(vals[50000:])
        a.merge(b)
        assert a.total_weight() == len(vals)
        assert a.quantile(0.5) == pytest.approx(0.5, abs=0.01)

    def test_roundtrip(self):
        td = TDigestSketch(100)
        td.update_values(np.arange(1000, dtype=float))
        r = TDigestSketch.loads(td.dumps())
        assert r.quantile(0.25) == td.quantile(0.25)


class TestMinHash:
    def test_jaccard_estimate(self):
        a, b = MinHashSketch(256), MinHashSketch(256)
        a.update_keys([f"tok{i}" for i in range(10000)])
        b.update_keys([f"tok{i}" for i in range(5000, 15000)])
        assert a.jaccard(b) == pytest.approx(1 / 3, abs=3 / np.sqrt(256))

    def test_merge_equals_single(self):
        keys = [f"t{i}" for i in range(5000)]
        single = MinHashSketch(128)
        single.update_keys(keys)
        a, b = MinHashSketch(128), MinHashSketch(128)
        a.update_keys(keys[:3000])
        b.update_keys(keys[3000:])
        a.merge(b)
        assert (a.sig == single.sig).all()

    def test_identical_sets_jaccard_one(self):
        a, b = MinHashSketch(64), MinHashSketch(64)
        a.update_keys(["x", "y", "z"])
        b.update_keys(["z", "x", "y"])
        assert a.jaccard(b) == 1.0

    def test_roundtrip(self):
        a = MinHashSketch(64)
        a.update_keys(["p", "q"])
        assert (MinHashSketch.loads(a.dumps()).sig == a.sig).all()


class TestBloomSketchAdapter:
    def test_state_is_valid_poppy_file(self):
        from poppy_spark.core import loads as bloom_loads

        sk = BloomSketch.create(1000, 0.01)
        sk.update_keys(["alpha", "beta"])
        f = bloom_loads(sk.dumps())
        assert f.contains_bytes("alpha") and f.contains_bytes("beta")
        assert not f.contains_bytes("gamma")

    def test_factory_pickles(self):
        # Spark ships closures with cloudpickle, so that is what must work
        from pyspark import cloudpickle as pickle

        f = BloomSketch.factory(100, 0.01)
        f2 = pickle.loads(pickle.dumps(f))
        sk = f2()
        sk.update_keys(["x"])
        assert sk.result() == 1


class TestCosineNearDup:
    def test_lsh_method_subset_of_exact(self, spark, sf_dir):
        """LSH-pruned near-dup pairs are a subset of the exact pairs and
        keep high recall at a high threshold."""
        from poppy_spark.spark.similarity import cosine_near_dup_pairs

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.35, method="exact")
        lsh = cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.35, method="lsh")
        e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
        l = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
        assert l <= e
        # at cosine 0.35 (~69 deg) hyperplane collision probability is low by
        # design — LSH targets the near-1 regime (see the planted-recall
        # oracle gate); here we only pin that pruning finds *some* pairs
        assert len(l) >= 0.1 * len(e)


class TestTopKSketch:
    def test_mg_bound_and_exactness_under_capacity(self):
        from poppy_spark.sketches import TopKSketch

        s = TopKSketch(m=8)
        s.update_keys(["a"] * 100 + ["b"] * 50 + ["c"] * 10)
        # fewer distinct keys than m: exact
        assert s.estimate("a") == 100 and s.estimate("b") == 50

    def test_mg_bound_over_capacity(self):
        import numpy as np

        from poppy_spark.sketches import TopKSketch

        rng = np.random.default_rng(7)
        keys = ["hot"] * 500 + [f"k{i}" for i in rng.integers(0, 2000, 5000)]
        rng.shuffle(keys)
        s = TopKSketch(m=64)
        for i in range(0, len(keys), 700):
            s.update_keys(keys[i : i + 700])
        n = len(keys)
        est = s.estimate("hot")
        assert 500 - n // 65 <= est <= 500
        assert s.top(1)[0][0] == b"hot"

    def test_mg_merge_tree_keeps_bound(self):
        import numpy as np

        from poppy_spark.sketches import TopKSketch

        rng = np.random.default_rng(11)
        keys = ["big"] * 900 + [f"x{i}" for i in rng.integers(0, 3000, 6000)]
        rng.shuffle(keys)
        parts = [keys[i::7] for i in range(7)]
        sketches = []
        for p in parts:
            s = TopKSketch(m=64)
            s.update_keys(p)
            sketches.append(s)
        merged = sketches[0]
        for s in sketches[1:]:
            merged.merge(TopKSketch.loads(s.dumps()))
        n = len(keys)
        assert 900 - n // 65 <= merged.estimate("big") <= 900
        assert merged.n_total == n

    def test_topk_spark_build_matches_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from poppy_spark.sketches import TopKSketch
        from poppy_spark.spark.agg import build_sketch

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        sk = build_sketch(events, "user_id", TopKSketch.factory(256))
        exact = {
            str(r["user_id"]): r["n"]
            for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        for uid, n in list(exact.items())[:20]:
            est = sk.estimate(uid)
            assert n - sk.max_error <= est <= n


class TestHllSparse:
    def test_sparse_until_threshold_then_dense(self):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        h = HllSketch(12)  # m=4096, limit 512
        h.update_hashes(np.arange(1, 201, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        assert h.is_sparse
        h.update_hashes(np.arange(1, 20001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        assert not h.is_sparse

    def test_sparse_dense_estimates_equal(self):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        hashes = np.random.default_rng(7).integers(0, 2**64, 300, dtype=np.uint64)
        sp = HllSketch(14)
        sp.update_hashes(hashes)
        assert sp.is_sparse
        dn = HllSketch(14)
        dn._densify()
        dn.update_hashes(hashes)
        assert not dn.is_sparse
        assert sp.result() == dn.result()
        assert (sp.registers == dn.registers).all()  # registers densifies view

    def test_merge_all_form_combinations(self):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        rng = np.random.default_rng(11)
        a_h = rng.integers(0, 2**64, 400, dtype=np.uint64)
        b_h = rng.integers(0, 2**64, 50000, dtype=np.uint64)
        want = HllSketch(12)
        want.update_hashes(np.concatenate([a_h, b_h]))

        def mk(hs, dense):
            s = HllSketch(12)
            if dense:
                s._densify()
            s.update_hashes(hs)
            return s

        for da in (False, True):
            for db in (False, True):
                x, y = mk(a_h, da), mk(b_h, db)
                x.merge(y)
                assert (x.registers == want.registers).all(), (da, db)

    def test_wire_roundtrip_and_size(self):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        small = HllSketch(14)
        small.update_hashes(
            np.random.default_rng(3).integers(0, 2**64, 100, dtype=np.uint64)
        )
        raw = small.dumps()
        assert len(raw) < 600  # ~100 pairs * 5B + header, vs 16 KiB dense
        back = HllSketch.loads(raw)
        assert back.is_sparse and back.result() == small.result()
        assert back.dumps() == raw  # stable bytes

        big = HllSketch(10)
        big.update_hashes(
            np.random.default_rng(4).integers(0, 2**64, 50000, dtype=np.uint64)
        )
        raw_big = big.dumps()
        assert len(raw_big) == len(b"PSHLL\x01") + 1 + 1024  # dense layout unchanged
        assert HllSketch.loads(raw_big).result() == big.result()

    def test_final_form_is_ordering_invariant(self):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        # occupancy stays under the limit -> every merge order ends sparse
        # with identical bytes; the dense/sparse choice is a function of the
        # final occupied-register SET, never of the partition order
        rng = np.random.default_rng(9)
        parts = [rng.integers(0, 2**64, 60, dtype=np.uint64) for _ in range(6)]

        def fold(order):
            acc = HllSketch(14)
            for i in order:
                s = HllSketch(14)
                s.update_hashes(parts[i])
                acc.merge(s)
            return acc.dumps()

        assert fold([0, 1, 2, 3, 4, 5]) == fold([5, 3, 1, 0, 4, 2])

    def test_grouped_build_ships_small_states(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.sketches import HllSketch
        from poppy_spark.spark.agg import build_sketch_grouped

        # 200 groups x ~25 distinct keys: every shipped state should be a
        # few hundred bytes, not the 16 KiB dense array
        df = spark.range(5000).select(
            (F.col("id") % 200).alias("g"), (F.col("id") % 5000).cast("string").alias("k")
        )
        states = build_sketch_grouped(df, "k", ["g"], HllSketch.factory(14))
        sizes = [len(r["state"]) for r in states.collect()]
        assert len(sizes) == 200
        assert max(sizes) < 600
        est = HllSketch.loads(sizes and states.first()["state"]).result()
        assert 20 <= est <= 30


class TestMemoryBounds:
    """memory_bound_bytes must bound the POPULATED in-memory state, not the
    (possibly tiny) empty wire form — grouped builds size their per-task
    flush guard from it (round-3 advice, sketches with compact empty
    encodings under-budgeted by 100-2000x)."""

    def test_populated_dumps_within_bound(self):
        import numpy as np

        from poppy_spark.sketches import (
            HllSketch,
            KllSketch,
            TDigestSketch,
            ThetaSketch,
            TopKSketch,
        )

        rng = np.random.default_rng(7)
        h = rng.integers(0, 2**63, size=200_000, dtype=np.int64).astype(np.uint64)

        th = ThetaSketch(4096)
        bound = th.memory_bound_bytes()  # taken FRESH, like the flush guard
        th.update_hashes(h)
        assert th.values.nbytes <= bound
        assert len(th.dumps()) <= bound

        kll = KllSketch(200)
        bound = kll.memory_bound_bytes()
        for chunk in np.array_split(rng.normal(size=100_000), 20):
            kll.update_values(chunk)
        assert sum(lv.nbytes for lv in kll.levels) <= bound
        assert len(kll.dumps()) <= bound

        td = TDigestSketch(200.0)
        bound = td.memory_bound_bytes()
        for chunk in np.array_split(rng.normal(size=100_000), 20):
            td.update_values(chunk)
        assert td.means.nbytes + td.weights.nbytes <= bound
        assert len(td.dumps()) <= bound

        tk = TopKSketch(256)
        fresh_bound = tk.memory_bound_bytes()
        tk.update_keys([f"user-{i % 700:04d}" for i in range(20_000)])
        assert len(tk.dumps()) <= fresh_bound
        # live bound tracks actually-observed key sizes
        tk.update_keys(["x" * 200])
        assert tk.memory_bound_bytes() >= 256 * 200

        # fresh bounds are far above the misleading empty wire size
        assert ThetaSketch(4096).memory_bound_bytes() > 100 * len(ThetaSketch(4096).dumps())
        assert KllSketch(200).memory_bound_bytes() > 50 * len(KllSketch(200).dumps())
        assert HllSketch(14).memory_bound_bytes() >= (1 << 14)
