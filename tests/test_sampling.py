"""Deterministic content-hash sampling: stability, disjointness, rates."""

import pytest
from pyspark.sql import functions as F

from poppy_spark.spark.sampling import (
    _thr_hex,
    hash_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document-text-"), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
    )


class TestHashSample:
    def test_rate_approximate_and_deterministic(self, docs):
        a = hash_sample(docs, "text", 0.2, seed=1)
        n = a.count()
        assert 0.15 * 5000 <= n <= 0.25 * 5000
        assert a.count() == n  # recompute: same rows
        ids = {r[0] for r in a.select("doc_id").collect()}
        # invariant under physical layout: repartition resamples NOTHING
        b = hash_sample(docs.repartition(13, "lang"), "text", 0.2, seed=1)
        assert {r[0] for r in b.select("doc_id").collect()} == ids

    def test_seed_changes_selection(self, docs):
        a = {r[0] for r in hash_sample(docs, "text", 0.2, seed=1).select("doc_id").collect()}
        b = {r[0] for r in hash_sample(docs, "text", 0.2, seed=2).select("doc_id").collect()}
        assert a != b
        assert len(a & b) < len(a)  # independent-ish

    def test_rate_bounds(self, docs):
        assert hash_sample(docs, "text", 0.0).count() == 0
        assert hash_sample(docs, "text", 1.0).count() == 5000
        with pytest.raises(ValueError):
            _thr_hex(1.5)


class TestStratified:
    def test_per_group_rates(self, docs):
        out = stratified_sample(
            docs, "text", "lang", {"en": 1.0, "fr": 0.1}, seed=3
        )
        by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        n_en = docs.filter(F.col("lang") == "en").count()
        n_fr = docs.filter(F.col("lang") == "fr").count()
        assert by["en"] == n_en  # rate 1.0 keeps everything
        assert 0.05 * n_fr <= by.get("fr", 0) <= 0.16 * n_fr

    def test_default_rate_zero_drops_unlisted(self, docs):
        out = stratified_sample(docs, "text", "lang", {"en": 0.5}, seed=3)
        assert out.filter(F.col("lang") == "fr").count() == 0


class TestHashSplit:
    def test_disjoint_exhaustive_stable(self, docs):
        out = hash_split(docs, "doc_id", [0.8, 0.1, 0.1], seed=4)
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 5000  # exhaustive
        assert set(counts) == {0, 1, 2}
        assert counts[0] > counts[1] and counts[0] > counts[2]
        assert 0.7 * 5000 <= counts[0] <= 0.9 * 5000
        # same key -> same split, independent of which frame it sits in
        again = hash_split(docs.repartition(7), "doc_id", [0.8, 0.1, 0.1], seed=4)
        joined = out.alias("a").join(again.alias("b"), "doc_id").filter(
            F.col("a.split") != F.col("b.split")
        )
        assert joined.count() == 0

    def test_weights_validation(self, docs):
        with pytest.raises(ValueError):
            hash_split(docs, "doc_id", [0.0, 0.0])


class TestBottomK:
    def test_deterministic_and_uniformish(self, docs, spark):
        from poppy_spark.spark.sampling import bottom_k_sample

        a = {r["key"] for r in bottom_k_sample(docs, "text", 100, seed=5).collect()}
        b = {
            r["key"]
            for r in bottom_k_sample(docs.repartition(11), "text", 100, seed=5).collect()
        }
        assert len(a) == 100
        assert a == b  # layout-invariant
        # mergeable: bottom-k of two halves' bottom-k == global bottom-k
        lo = docs.filter("doc_id < 2500")
        hi = docs.filter("doc_id >= 2500")
        part = bottom_k_sample(
            bottom_k_sample(lo, "text", 100, seed=5).unionAll(
                bottom_k_sample(hi, "text", 100, seed=5)
            ),
            "key", 100, seed=5,
        )
        assert {r["key"] for r in part.collect()} == a

    def test_duplicates_collapse(self, spark):
        from poppy_spark.spark.sampling import bottom_k_sample

        df = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "key string")
        out = bottom_k_sample(df, "key", 10)
        assert sorted(r["key"] for r in out.collect()) == ["x", "y"]

    def test_k_validation(self, docs):
        from poppy_spark.spark.sampling import bottom_k_sample

        with pytest.raises(ValueError):
            bottom_k_sample(docs, "text", 0)


class TestWeightedSample:
    def test_deterministic_layout_invariant(self, docs, spark):
        from poppy_spark.spark.sampling import weighted_sample

        w = docs.withColumn("wt", (F.col("doc_id") % 10 + 1).cast("double"))
        a = {r["key"] for r in weighted_sample(w, "text", "wt", 200, seed=2).collect()}
        b = {
            r["key"]
            for r in weighted_sample(w.repartition(13), "text", "wt", 200, seed=2).collect()
        }
        assert len(a) == 200
        assert a == b

    def test_weight_bias(self, docs):
        from poppy_spark.spark.sampling import weighted_sample

        # weight 100 for doc_id < 500, weight 1 otherwise: heavy keys should
        # dominate the sample far beyond their 10% population share
        w = docs.withColumn(
            "wt", F.when(F.col("doc_id") < 500, 100.0).otherwise(1.0)
        )
        out = weighted_sample(w, "doc_id", "wt", 300, seed=0)
        heavy = out.filter(F.col("key").cast("long") < 500).count()
        assert heavy > 200  # ~91% expected; uniform would give ~30

    def test_duplicate_keys_pool_weight(self, spark):
        from poppy_spark.spark.sampling import weighted_sample

        df = spark.createDataFrame(
            [("x", 1.0)] * 5 + [("y", 2.0)] + [("z", 0.0)], "key string, wt double"
        )
        out = weighted_sample(df, "key", "wt", 10)
        rows = {r["key"]: r["weight"] for r in out.collect()}
        assert rows == {"x": 5.0, "y": 2.0}  # z dropped (weight 0), x pooled

    def test_matches_duckdb_exactly(self, docs):
        import duckdb

        from poppy_spark.spark.sampling import weighted_sample

        w = docs.withColumn("wt", (F.col("doc_id") % 7 + 1).cast("double"))
        got = sorted(
            (r["key"], r["weight"])
            for r in weighted_sample(w, "text", "wt", 150, seed=4).collect()
        )
        pdf = w.select("text", "wt").toPandas()
        con = duckdb.connect()
        con.register("t", pdf)
        want = sorted(
            con.sql(
                "SELECT key, weight FROM ("
                " SELECT text AS key, SUM(wt) AS weight FROM t GROUP BY text)"
                " ORDER BY ln((('0x' || substr(md5('seed4|' || key), 1, 8))::BIGINT + 0.5)"
                "          / 4294967296.0) / weight DESC, key LIMIT 150"
            ).fetchall()
        )
        assert got == want

    def test_k_validation(self, docs):
        from poppy_spark.spark.sampling import weighted_sample

        with pytest.raises(ValueError):
            weighted_sample(docs.withColumn("wt", F.lit(1.0)), "text", "wt", 0)


class TestQuantileBuckets:
    def test_balanced_and_exhaustive(self, docs, spark):
        from poppy_spark.spark.sampling import quantile_buckets

        df = docs.withColumn("v", (F.col("doc_id") * 37 % 5000).cast("double"))
        out = quantile_buckets(df, "v", 10)
        counts = {r["bucket"]: r["count"] for r in out.groupBy("bucket").count().collect()}
        assert set(counts) == set(range(10))
        assert sum(counts.values()) == 5000  # every row assigned exactly once
        for n in counts.values():
            assert abs(n - 500) <= 50  # within KLL rank error of equal mass

    def test_rerun_deterministic_and_monotone(self, docs):
        from poppy_spark.spark.sampling import quantile_buckets

        df = docs.withColumn("v", (F.col("doc_id") % 977).cast("double"))
        a = sorted((r["doc_id"], r["bucket"]) for r in quantile_buckets(df, "v", 4).collect())
        b = sorted((r["doc_id"], r["bucket"]) for r in quantile_buckets(df, "v", 4).collect())
        assert a == b  # same input layout -> same boundaries -> same buckets
        # assignment is monotone in v: sorting by value never decreases bucket
        rows = sorted(
            (r["v"], r["bucket"])
            for r in quantile_buckets(df, "v", 4).select("v", "bucket").collect()
        )
        assert all(rows[i][1] <= rows[i + 1][1] for i in range(len(rows) - 1))

    def test_validation(self, docs):
        from poppy_spark.spark.sampling import quantile_buckets

        with pytest.raises(ValueError):
            quantile_buckets(docs.withColumn("v", F.lit(1.0)), "v", 1)


def test_quantile_buckets_null_values_get_null_bucket(spark):
    from pyspark.sql import functions as F

    from poppy_spark.spark.sampling import quantile_buckets

    df = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, F.col("id").cast("double")).alias("v")
    )
    out = quantile_buckets(df, "v", 4)
    nulls = out.filter(F.col("v").isNull())
    assert nulls.count() == 100
    assert nulls.filter(F.col("bucket").isNotNull()).count() == 0
    assert out.filter(F.col("v").isNotNull() & F.col("bucket").isNull()).count() == 0


class TestGroupedBottomK:
    def test_exact_per_group_and_deterministic(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.sampling import grouped_bottom_k

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = grouped_bottom_k(docs, "doc_id", "lang", 5, seed=2)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for g, n in full.items():
            assert counts.get(g, 0) == min(n, 5)
        # layout-invariant row set
        again = grouped_bottom_k(docs.repartition(13), "doc_id", "lang", 5, seed=2)
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )
        # matches the brute-force definition: k smallest md5(seed|key) per group
        import hashlib

        rows = docs.select("doc_id", "lang").collect()
        bygroup = {}
        for r in rows:
            bygroup.setdefault(r["lang"], []).append(r["doc_id"])
        want = set()
        for g, ids in bygroup.items():
            ranked = sorted(ids, key=lambda i: (hashlib.md5(f"seed2|{i}".encode()).hexdigest()[:8], str(i)))
            want.update(ranked[:5])
        assert {r["doc_id"] for r in out.collect()} == want

    def test_validation(self, spark):
        import pytest as _pytest

        from poppy_spark.spark.sampling import grouped_bottom_k

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with _pytest.raises(ValueError):
            grouped_bottom_k(docs, "doc_id", "lang", 0)


class TestEpochShuffle:
    def test_reproducible_and_epoch_distinct(self, spark):
        from poppy_spark.spark.sampling import epoch_shuffle

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

        def order(df, epoch):
            return [
                r["doc_id"]
                for r in epoch_shuffle(df, "doc_id", epoch=epoch, n_buckets=4)
                .orderBy("epoch_bucket", "epoch_rank")
                .collect()
            ]

        a = order(docs, 1)
        b = order(docs.repartition(9), 1)
        assert a == b  # layout-invariant emission order
        c = order(docs, 2)
        assert a != c and sorted(a) == sorted(c)  # new epoch, same rows

    def test_bucket_ranges_are_the_global_order(self, spark):
        """Bucket b covers hash range [b/N, (b+1)/N): ranges are disjoint
        and ordered, so a partitionBy(bucket) write read in bucket order
        IS the global permutation — no global sort ran."""
        from pyspark.sql import functions as F

        from poppy_spark.spark.sampling import epoch_shuffle

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = epoch_shuffle(docs, "doc_id", epoch=3, n_buckets=8)
        spans = {
            r["epoch_bucket"]: (r["lo"], r["hi"])
            for r in out.groupBy("epoch_bucket")
            .agg(F.min("epoch_rank").alias("lo"), F.max("epoch_rank").alias("hi"))
            .collect()
        }
        assert len(spans) >= 6  # rows spread over most buckets
        keys = sorted(spans)
        for a, b in zip(keys, keys[1:]):
            assert spans[a][1] < spans[b][0]  # disjoint, ordered ranges
        # the emission contract end-to-end: write partitioned, read buckets
        # in numeric order, get the exact md5-sorted permutation
        flat = []
        for k in keys:
            part = (
                out.filter(F.col("epoch_bucket") == k)
                .select("epoch_rank")
                .collect()
            )
            flat.extend(r["epoch_rank"] for r in part)
        assert sorted(flat) == sorted(r["epoch_rank"] for r in out.collect())
        within = [
            [r["epoch_rank"] for r in out.filter(F.col("epoch_bucket") == k).collect()]
            for k in keys
        ]
        # buckets colocate per task and were sorted within tasks
        for w in within:
            assert w == sorted(w)
