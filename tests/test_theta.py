"""Theta/KMV sketch: exact mode, estimation error, set-op algebra, merge
laws, serialization, and the distributed build path."""

import numpy as np
import pytest

from poppy_spark.sketches import ThetaSketch


def _sk(keys, k=1024):
    s = ThetaSketch(k)
    s.update_keys([str(x).encode() for x in keys])
    return s


class TestExactMode:
    def test_below_k_is_exact(self):
        s = _sk(range(500), k=1024)
        assert s.theta == 1.0
        assert s.result() == 500

    def test_duplicates_ignored(self):
        s = _sk([1, 2, 3] * 100, k=1024)
        assert s.result() == 3


class TestEstimation:
    def test_relative_error_bound(self):
        n, k = 200_000, 4096
        s = _sk(range(n), k=k)
        tol = 4 * s.relative_error()
        assert abs(s.estimate() - n) <= tol * n

    def test_merge_equals_single_build(self):
        a = _sk(range(0, 60_000), k=2048)
        b = _sk(range(40_000, 120_000), k=2048)
        one = _sk(range(0, 120_000), k=2048)
        a.merge(b)
        # merge is a union of samples: identical hash sets -> identical state
        assert a.dumps() == one.dumps()

    def test_merge_commutative_associative(self):
        parts = [list(range(i * 10_000, (i + 2) * 10_000)) for i in range(4)]
        x = ThetaSketch(512)
        for p in parts:
            x.merge(_sk(p, k=512))
        y = ThetaSketch(512)
        for p in reversed(parts):
            y.merge(_sk(p, k=512))
        assert x.dumps() == y.dumps()


class TestSetOps:
    def test_intersection_and_difference(self):
        k = 4096
        a = _sk(range(0, 100_000), k=k)
        b = _sk(range(60_000, 160_000), k=k)
        true_inter = 40_000
        tol = 6 * a.relative_error()  # set-op error > single-set error
        assert abs(a.intersection(b) - true_inter) <= tol * true_inter
        assert abs(a.difference(b) - 60_000) <= tol * 60_000
        assert abs(a.union_estimate(b) - 160_000) <= tol * 160_000

    def test_disjoint_sets(self):
        a = _sk(range(0, 50_000), k=2048)
        b = _sk(range(50_000, 100_000), k=2048)
        assert a.intersection(b) <= 0.01 * 50_000

    def test_jaccard(self):
        a = _sk(range(0, 80_000), k=4096)
        b = _sk(range(40_000, 120_000), k=4096)
        assert abs(a.jaccard(b) - 1 / 3) <= 0.05

    def test_exact_mode_set_ops_are_exact(self):
        a = _sk(range(0, 300), k=1024)
        b = _sk(range(200, 500), k=1024)
        assert a.intersection(b) == 100
        assert a.difference(b) == 200
        assert a.union_estimate(b) == 500


class TestSerialization:
    def test_roundtrip(self):
        s = _sk(range(10_000), k=512)
        r = ThetaSketch.loads(s.dumps())
        assert r.k == s.k
        assert np.array_equal(r.values, s.values)
        assert r.dumps() == s.dumps()

    def test_rejects_foreign_bytes(self):
        with pytest.raises(ValueError):
            ThetaSketch.loads(b"not a theta state")

    def test_k_validation(self):
        with pytest.raises(ValueError):
            ThetaSketch(4)


class TestSpark:
    def test_distributed_build_matches_driver(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.agg import build_sketch

        df = spark.range(50_000).select(
            F.concat(F.lit("theta-key-"), F.col("id")).alias("key")
        ).repartition(16)
        sk = build_sketch(df, "key", ThetaSketch.factory(2048))
        # exact distinct is 50k; the estimate must sit in the published bound
        assert abs(sk.estimate() - 50_000) <= 4 * sk.relative_error() * 50_000
        # partition-order invariance: rebuild over a different layout
        sk2 = build_sketch(df.repartition(5), "key", ThetaSketch.factory(2048))
        assert sk.dumps() == sk2.dumps()


class TestPairwise:
    def test_distributed_overlap_matrix(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.agg import build_sketch_grouped, sketch_pairwise

        # 4 groups over overlapping integer ranges
        df = spark.range(40_000).select(
            (F.col("id") % 4).cast("string").alias("grp"),
            F.concat(F.lit("k"), (F.col("id") / 2).cast("long")).alias("key"),
        )
        states = build_sketch_grouped(df, "key", ["grp"], ThetaSketch.factory(4096))
        mat = sketch_pairwise(
            states,
            ThetaSketch,
            lambda a, b: a.intersection(b),
            "grp",
            value_name="n_common",
        ).collect()
        got = {(r["group_a"], r["group_b"]): r["n_common"] for r in mat}
        assert len(got) == 6
        # groups 0/1 share every other key-pair: ids 2j and 2j+1 collapse to
        # the same key, and consecutive ids alternate groups -> overlap 10k
        assert got[("0", "1")] == pytest.approx(10_000, rel=0.15)
        assert got[("0", "2")] == pytest.approx(0, abs=200)

    def test_pairwise_guard_and_explicit_pairs(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.agg import build_sketch_grouped, sketch_pairwise

        df = spark.range(2_000).select(
            (F.col("id") % 40).cast("string").alias("grp"),
            F.col("id").cast("string").alias("key"),
        )
        states = build_sketch_grouped(df, "key", ["grp"], ThetaSketch.factory(256))
        with pytest.raises(ValueError):
            sketch_pairwise(
                states, ThetaSketch, lambda a, b: a.jaccard(b), "grp", max_groups=10
            )
        pairs = spark.createDataFrame(
            [("0", "1"), ("2", "3")], "group_a string, group_b string"
        )
        out = sketch_pairwise(
            states, ThetaSketch, lambda a, b: a.jaccard(b), "grp", pairs=pairs
        ).collect()
        assert len(out) == 2  # only the requested candidates compared
