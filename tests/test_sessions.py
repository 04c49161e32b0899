"""Sessionization: gap splits, tie handling, determinism, stats rollup."""

import pytest
from pyspark.sql import functions as F

from poppy_spark.spark.sessions import session_stats, sessionize


class TestSessionize:
    def test_gap_splits(self, spark):
        rows = [
            ("u1", 0), ("u1", 100), ("u1", 200),      # session 0
            ("u1", 5000), ("u1", 5100),                # session 1 (gap 4800)
            ("u1", 99000),                             # session 2
            ("u2", 0), ("u2", 100000),                 # u2: two sessions
        ]
        df = spark.createDataFrame(rows, "user string, t bigint").select(
            "user", F.timestamp_seconds("t").alias("ts")
        )
        out = sessionize(df, "user", "ts", gap_seconds=3600)
        got = {
            (r["user"], r["ts"].timestamp()): r["session_id"] for r in out.collect()
        }
        assert got[("u1", 0)] == got[("u1", 100)] == got[("u1", 200)] == 0
        assert got[("u1", 5000)] == got[("u1", 5100)] == 1
        assert got[("u1", 99000)] == 2
        assert got[("u2", 0)] == 0 and got[("u2", 100000)] == 1

    def test_ties_share_session_deterministically(self, spark):
        rows = [("u", 0), ("u", 10000), ("u", 10000), ("u", 10000)]
        df = spark.createDataFrame(rows, "user string, t bigint").select(
            "user", F.timestamp_seconds("t").alias("ts")
        )
        for layout in (df, df.repartition(7)):
            out = sessionize(layout, "user", "ts", gap_seconds=3600).collect()
            by_t = {}
            for r in out:
                by_t.setdefault(r["ts"].timestamp(), set()).add(r["session_id"])
            assert by_t[10000.0] == {1}  # all three ties in ONE session
            assert by_t[0.0] == {0}

    def test_stats_rollup(self, spark):
        rows = [("u", 0), ("u", 60), ("u", 90000), ("u", 90060), ("u", 90120)]
        df = spark.createDataFrame(rows, "user string, t bigint").select(
            "user", F.timestamp_seconds("t").alias("ts")
        )
        s = sessionize(df, "user", "ts", gap_seconds=3600)
        stats = {
            r["session_id"]: r
            for r in session_stats(s, "user", "ts").collect()
        }
        assert stats[0]["n_events"] == 2 and stats[0]["duration_sec"] == 60
        assert stats[1]["n_events"] == 3 and stats[1]["duration_sec"] == 120

    def test_gap_validation(self, spark):
        df = spark.createDataFrame([("u", 0)], "user string, t bigint")
        with pytest.raises(ValueError):
            sessionize(df, "user", "t", gap_seconds=0)


class TestRollingAgg:
    def test_known_window_membership(self, spark):
        from poppy_spark.spark.sessions import rolling_agg

        rows = [
            ("u", "2024-01-01 00:00:00", 1.0),
            ("u", "2024-01-01 00:00:30", 2.0),
            ("u", "2024-01-01 00:01:00", 4.0),   # 60s window: all three
            ("u", "2024-01-01 00:02:01", 8.0),   # only itself (61s after #3)
            ("v", "2024-01-01 00:00:10", 100.0), # other key: independent
        ]
        df = spark.createDataFrame(rows, "k string, ts string, value double")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            (r["k"], str(r["ts"])): (r["w_count"], r["w_sum"])
            for r in rolling_agg(df, "k", "ts", "value", 60).collect()
        }
        assert got[("u", "2024-01-01 00:00:00")] == (1, 1.0)
        assert got[("u", "2024-01-01 00:00:30")] == (2, 3.0)
        assert got[("u", "2024-01-01 00:01:00")] == (3, 7.0)  # inclusive bound
        assert got[("u", "2024-01-01 00:02:01")] == (1, 8.0)
        assert got[("v", "2024-01-01 00:00:10")] == (1, 100.0)

    def test_validation(self, spark):
        import pytest as _pytest

        from poppy_spark.spark.sessions import rolling_agg

        df = spark.createDataFrame([("u", "2024-01-01", 1.0)], "k string, ts string, value double")
        with _pytest.raises(ValueError):
            rolling_agg(df, "k", "ts", "value", 0)
