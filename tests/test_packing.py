"""Sequence packing: budget invariant, exhaustive assignment, determinism
under physical layout, overflow handling, utilization."""

import math

import pytest
from pyspark.sql import functions as F

from poppy_spark.spark.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic pseudo-random lengths 10..509
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(500)) + 10).alias("n_tok"),
    )


BUDGET = 2048


class TestPacking:
    def test_budget_and_exhaustive(self, docs, spark):
        packed = pack_sequences(docs, "doc_id", "n_tok", BUDGET, n_buckets=16)
        assert packed.count() == 2000  # every doc assigned
        assert packed.select("doc_id").distinct().count() == 2000
        stats = pack_stats(packed, "n_tok")
        over_budget = stats.filter(
            (F.col("n_tokens") > BUDGET) & ~F.col("overflow")
        ).count()
        assert over_budget == 0

    def test_deterministic_under_repartition(self, docs):
        a = pack_sequences(docs, "doc_id", "n_tok", BUDGET, n_buckets=16)
        b = pack_sequences(
            docs.repartition(37), "doc_id", "n_tok", BUDGET, n_buckets=16
        )
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0  # assignment is content-determined, not layout-determined

    def test_overflow_isolated(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 5000), (3, 200), (4, 150)], "doc_id bigint, n_tok bigint"
        )
        packed = pack_sequences(df, "doc_id", "n_tok", 1000, n_buckets=1)
        rows = {r["doc_id"]: r for r in packed.collect()}
        assert rows[2]["overflow"]
        assert not rows[1]["overflow"]
        # the oversized doc sits alone in its pack
        mates = [d for d, r in rows.items() if r["pack_id"] == rows[2]["pack_id"]]
        assert mates == [2]
        # the others share the budget normally
        assert rows[1]["pack_id"] == rows[3]["pack_id"] == rows[4]["pack_id"]

    def test_utilization_and_pack_bound(self, docs):
        packed = pack_sequences(docs, "doc_id", "n_tok", BUDGET, n_buckets=16)
        stats = pack_stats(packed, "n_tok").collect()
        total = sum(r["n_tokens"] for r in stats)
        n_packs = len(stats)
        # greedy bound: every closed pack is > budget - max_len full
        assert n_packs <= math.ceil(total / (BUDGET - 509)) + 16
        # aggregate utilization sanity
        assert total / (n_packs * BUDGET) >= 0.5

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs, "doc_id", "n_tok", 0)
        with pytest.raises(ValueError):
            pack_sequences(docs, "doc_id", "n_tok", 100, n_buckets=0)
