"""One-pass multi-column sketch builds and the table profiler."""

import pytest
from pyspark.sql import functions as F


class TestBuildSketchesMulti:
    def test_matches_single_column_builds(self, spark):
        from poppy_spark.sketches import HllSketch
        from poppy_spark.spark.agg import build_sketch
        from poppy_spark.spark.profile import build_sketches_multi

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        multi = build_sketches_multi(
            ev,
            {
                "users": ("user_id", HllSketch.factory(12)),
                "types": ("event_type", HllSketch.factory(12)),
            },
        )
        for name, col in [("users", "user_id"), ("types", "event_type")]:
            single = build_sketch(ev, col, HllSketch.factory(12))
            assert multi[name][0].dumps() == single.dumps()  # byte-equal states

    def test_nulls_dropped_per_column(self, spark):
        from poppy_spark.sketches import HllSketch
        from poppy_spark.spark.profile import build_sketches_multi

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, "b"), (None, None)],
            "x bigint, y string",
        )
        out = build_sketches_multi(
            df, {"x": ("x", HllSketch.factory(12)), "y": ("y", HllSketch.factory(12))}
        )
        assert out["x"][1] == 2 and out["y"][1] == 2  # non-null counts
        assert out["x"][0].result() == 2 and out["y"][0].result() == 2

    def test_empty_specs_rejected(self, spark):
        from poppy_spark.spark.profile import build_sketches_multi

        with pytest.raises(ValueError):
            build_sketches_multi(spark.range(3), {})


class TestProfileTable:
    def test_exact_stats_and_bounds(self, spark):
        from poppy_spark.spark.profile import profile_table

        df = spark.createDataFrame(
            [(float(i), f"s{i % 7}", None if i % 5 == 0 else i) for i in range(1000)],
            "v double, s string, n bigint",
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["v"]["n_rows"] == 1000 and prof["v"]["n_nulls"] == 0
        assert prof["v"]["min_num"] == 0.0 and prof["v"]["max_num"] == 999.0
        assert abs(prof["v"]["distinct_est"] - 1000) <= 40
        assert abs(prof["v"]["p50"] - 500) <= 25
        assert prof["s"]["distinct_est"] == 7
        assert prof["s"]["min_str"] == "s0" and prof["s"]["max_str"] == "s6"
        assert prof["s"]["p50"] is None  # non-numeric: no quantile
        assert prof["n"]["n_nulls"] == 200

    def test_unknown_column_rejected(self, spark):
        from poppy_spark.spark.profile import profile_table

        with pytest.raises(ValueError):
            profile_table(spark.range(3), ["nope"])
