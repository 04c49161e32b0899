"""As-of join: backward-inclusive match, nulls before first right row,
layout invariance, one-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from poppy_spark.spark.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 10, "b"), ("u1", 20, "c"),
         ("u2", 7, "d"), ("u3", 9, "e")],
        "key string, t bigint, tag string",
    ).select("key", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [("u1", 4, 100.0), ("u1", 10, 200.0), ("u1", 15, 300.0),
         ("u2", 8, 400.0)],
        "key string, t bigint, price double",
    ).select("key", F.timestamp_seconds("t").alias("ts"), "price")
    return left, right


class TestAsofJoin:
    def test_backward_inclusive(self, frames):
        left, right = frames
        out = asof_join(left, right, "key", "ts", ["price"])
        got = {r["tag"]: r["price_asof"] for r in out.collect()}
        assert got["a"] == 100.0   # t=5 -> latest right at 4
        assert got["b"] == 200.0   # t=10 -> the simultaneous right row matches
        assert got["c"] == 300.0   # t=20 -> latest right at 15
        assert got["d"] is None    # u2 t=7 precedes u2's only right row (t=8)
        assert got["e"] is None    # u3 has no right rows at all

    def test_left_rows_preserved(self, frames):
        left, right = frames
        out = asof_join(left, right, "key", "ts", ["price"])
        assert out.count() == left.count()
        assert out.columns == left.columns + ["price_asof"]

    def test_layout_invariant(self, frames):
        left, right = frames
        a = asof_join(left, right, "key", "ts", ["price"])
        b = asof_join(left.repartition(7), right.repartition(3), "key", "ts", ["price"])
        assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0

    def test_single_shuffle_plan(self, frames):
        left, right = frames
        plan = asof_join(left, right, "key", "ts", ["price"])._jdf.queryExecution().executedPlan().toString()
        # exactly one Exchange: union + window, no join operator at all
        assert plan.count("Exchange") == 1
        assert "Join" not in plan

    def test_requires_payload(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            asof_join(left, right, "key", "ts", [])


class TestIntervalJoin:
    @pytest.fixture(scope="class")
    def data(self, spark):
        from pyspark.sql import functions as F

        points = spark.createDataFrame(
            [("u1", 100, "p1"), ("u1", 250, "p2"), ("u1", 900, "p3"),
             ("u2", 150, "p4")],
            "key string, t bigint, pid string",
        ).select("key", F.timestamp_seconds("t").alias("ts"), "pid")
        ivs = spark.createDataFrame(
            [("u1", 50, 120, "i1"),    # contains p1
             ("u1", 90, 300, "i2"),    # contains p1 and p2
             ("u2", 100, 200, "i3"),   # contains p4
             ("u2", 800, 950, "i4")],  # contains nothing of u2's
            "key string, s bigint, e bigint, iid string",
        ).select(
            "key",
            F.timestamp_seconds("s").alias("t_start"),
            F.timestamp_seconds("e").alias("t_end"),
            "iid",
        )
        return points, ivs

    def test_containment_pairs(self, data):
        from poppy_spark.spark.asof import interval_join

        points, ivs = data
        out = interval_join(points, ivs, "ts", "t_start", "t_end", 60, key_col="key")
        pairs = {(r["pid"], r["iid"]) for r in out.collect()}
        assert pairs == {("p1", "i1"), ("p1", "i2"), ("p2", "i2"), ("p4", "i3")}

    def test_bucket_size_is_pure_efficiency_knob(self, data):
        from poppy_spark.spark.asof import interval_join

        points, ivs = data
        expected = {("p1", "i1"), ("p1", "i2"), ("p2", "i2"), ("p4", "i3")}
        for bucket in (1, 7, 1000, 10**6):
            out = interval_join(points, ivs, "ts", "t_start", "t_end", bucket, key_col="key")
            assert {(r["pid"], r["iid"]) for r in out.collect()} == expected, bucket

    def test_no_duplicate_pairs(self, data):
        from poppy_spark.spark.asof import interval_join

        points, ivs = data
        out = interval_join(points, ivs, "ts", "t_start", "t_end", 10, key_col="key")
        assert out.count() == out.distinct().count() == 4

    def test_validation(self, data):
        from poppy_spark.spark.asof import interval_join

        points, ivs = data
        with pytest.raises(ValueError):
            interval_join(points, ivs, "ts", "t_start", "t_end", 0)
