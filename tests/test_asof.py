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
