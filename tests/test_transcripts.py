"""Transcripts generator invariants (FIXTURES.md §1 / BASELINE.json input_hint):
per-turn text equality under stable (conv_id, turn_idx) ordering, dense turn
indexes, monotone timestamps, role mix, skewed conversation, and an
end-to-end grouped sketch query over the generated table with a DuckDB
oracle."""

import duckdb
import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from poppy_spark.data.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return generate_transcripts(spark, n_convs=400, seed=42).cache()


class TestInvariants:
    def test_schema(self, transcripts):
        assert [(f.name, f.dataType.simpleString()) for f in transcripts.schema.fields] == [
            ("conv_id", "string"),
            ("turn_idx", "int"),
            ("role", "string"),
            ("text", "string"),
            ("tool", "string"),
            ("ts", "timestamp"),
        ]

    def test_per_turn_text_equality_on_regeneration(self, spark, transcripts):
        """The input_hint per-row invariant: regenerating yields byte-identical
        text for every (conv_id, turn_idx)."""
        again = generate_transcripts(spark, n_convs=400, seed=42)
        diff = transcripts.exceptAll(again).count() + again.exceptAll(transcripts).count()
        assert diff == 0

    def test_seed_changes_content(self, spark, transcripts):
        other = generate_transcripts(spark, n_convs=400, seed=43)
        assert transcripts.exceptAll(other).count() > 0

    def test_dense_turn_indexes(self, transcripts):
        bad = (
            transcripts.groupBy("conv_id")
            .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("n"))
            .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
            .count()
        )
        assert bad == 0

    def test_monotone_timestamps(self, transcripts):
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        viol = (
            transcripts.withColumn("prev", F.lag("ts").over(w))
            .filter("prev is not null and ts <= prev")
            .count()
        )
        assert viol == 0

    def test_role_mix_and_tool_nullability(self, transcripts):
        roles = dict(transcripts.groupBy("role").count().collect())
        assert set(roles) == {"user", "assistant", "system", "tool"}
        n = sum(roles.values())
        assert roles["user"] / n == pytest.approx(0.5, abs=0.05)
        assert (
            transcripts.filter((F.col("role") == "user") & F.col("tool").isNotNull()).count() == 0
        )

    def test_skewed_conversation(self, transcripts):
        top = transcripts.groupBy("conv_id").count().orderBy(F.desc("count")).first()
        assert top["conv_id"] == "conv-00000000"
        n = transcripts.count()
        assert top["count"] / n == pytest.approx(0.05, abs=0.02)

    def test_short_texts_exercise_identity_path(self, transcripts):
        assert transcripts.filter(F.length("text") <= 8).count() > 0


class TestTranscriptsSketchOracle:
    def test_grouped_hll_vs_duckdb(self, spark, transcripts, tmp_path):
        """Distinct texts per role: grouped HLL vs exact DuckDB on the same
        parquet bytes."""
        from poppy_spark.sketches import HllSketch
        from poppy_spark.spark.agg import build_sketch_grouped, sketch_value_column

        path = str(tmp_path / "transcripts.parquet")
        transcripts.write.mode("overwrite").parquet(path)
        states = build_sketch_grouped(transcripts, "text", ["role"], HllSketch.factory(14))
        got = {
            r["role"]: r["est"]
            for r in sketch_value_column(states, HllSketch, "est").collect()
        }
        con = duckdb.connect()
        exact = dict(
            con.execute(
                f"SELECT role, COUNT(DISTINCT text) FROM read_parquet('{path}/*.parquet') GROUP BY role"
            ).fetchall()
        )
        assert set(got) == set(exact)
        for role, est in got.items():
            assert est == pytest.approx(exact[role], rel=0.03, abs=3), role

    def test_bloom_membership_roundtrip(self, spark, transcripts):
        """Has this text been seen? — flagship membership over transcripts."""
        from poppy_spark.sketches import BloomSketch
        from poppy_spark.spark.agg import build_sketch
        from poppy_spark.spark.probe import bloom_anti_join

        n = transcripts.select("text").distinct().count()
        sk = build_sketch(
            transcripts.select("text").distinct(), "text", BloomSketch.factory(n, 0.001)
        )
        missed = bloom_anti_join(transcripts, "text", sk.dumps()).count()
        assert missed == 0
