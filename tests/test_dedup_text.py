"""Tests for dedup (exact / MinHash+LSH / SimHash), text analysis, and
embedding similarity operators — exact ground truth computed independently."""

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "a completely different document about spark aggregation and sketches",
        "numerical linear algebra is the heart of scientific computing today",
        "streaming systems process unbounded data with watermarks and state",
        "the cat sat on the mat and looked at the quick brown fox outside",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t))  # exact duplicate
        words = t.split()
        words[3] = "XYZ"  # near duplicate (one word changed)
        rows.append((i * 10 + 2, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


class TestExactDedup:
    def test_groups(self, corpus):
        from poppy_spark.spark.dedup import exact_duplicate_groups

        groups = exact_duplicate_groups(corpus, "text", "doc_id").collect()
        assert len(groups) == 5
        assert all(g["n_copies"] == 2 for g in groups)

    def test_drop_keeps_smallest_id(self, corpus):
        from poppy_spark.spark.dedup import drop_exact_duplicates

        kept = drop_exact_duplicates(corpus, "text", "doc_id")
        ids = {r["doc_id"] for r in kept.collect()}
        assert kept.count() == 10
        for i in range(5):
            assert i * 10 in ids and i * 10 + 1 not in ids and i * 10 + 2 in ids


class TestMinHashLsh:
    def test_signatures_match_for_identical_texts(self, corpus):
        from poppy_spark.spark.dedup import minhash_signatures

        sigs = {r["id"]: r["sig"] for r in minhash_signatures(corpus, "text", "doc_id", 64).collect()}
        for i in range(5):
            assert sigs[i * 10] == sigs[i * 10 + 1]

    def test_exact_duplicates_always_candidates(self, corpus):
        from poppy_spark.spark.dedup import lsh_candidate_pairs, minhash_signatures

        sigs = minhash_signatures(corpus, "text", "doc_id", 64)
        pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, 16, 4).collect()}
        for i in range(5):
            assert (i * 10, i * 10 + 1) in pairs

    def test_near_duplicate_pipeline(self, corpus):
        from poppy_spark.spark.dedup import near_duplicate_pairs

        found = near_duplicate_pairs(corpus, "text", "doc_id", threshold=0.6, n_perms=64, bands=16)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in found.collect()}
        # exact duplicates score 1.0
        for i in range(5):
            assert got.get((i * 10, i * 10 + 1)) == pytest.approx(1.0)
        # cross-topic pairs are never near-duplicates
        assert all(a // 10 == b // 10 for (a, b) in got)

    def test_minhash_jaccard_close_to_exact(self, corpus):
        from poppy_spark.spark.dedup import (
            exact_ngram_jaccard,
            lsh_candidate_pairs,
            minhash_jaccard,
            minhash_signatures,
        )

        sigs = minhash_signatures(corpus, "text", "doc_id", 128)
        pairs = lsh_candidate_pairs(sigs, 32, 4)
        est = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in minhash_jaccard(sigs, pairs).collect()}
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in exact_ngram_jaccard(corpus, "text", "doc_id", pairs).collect()
        }
        for p, e in exact.items():
            assert est[p] == pytest.approx(e, abs=3 / np.sqrt(128))


class TestSimHash:
    def test_identical_texts_same_hash(self, corpus):
        from poppy_spark.spark.dedup import simhash64

        sh = {r["id"]: r["simhash"] for r in simhash64(corpus, "text", "doc_id").collect()}
        for i in range(5):
            assert sh[i * 10] == sh[i * 10 + 1]

    def test_near_pairs_include_duplicates(self, corpus):
        from poppy_spark.spark.dedup import simhash_near_pairs

        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(corpus, "text", "doc_id", 10).collect()}
        for i in range(5):
            assert pairs.get((i * 10, i * 10 + 1)) == 0


class TestTextAnalysis:
    def test_token_counts_exact(self, spark):
        from poppy_spark.spark.text import token_count

        df = spark.createDataFrame(
            [("one two three",), ("  spaced   out  ",), ("", ), ("single",)],
            "text string",
        )
        got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
        assert got == [3, 2, 0, 1]

    def test_text_stats(self, spark):
        from poppy_spark.spark.text import text_stats

        df = spark.createDataFrame([("Hello, World 123!",)], "text string")
        r = text_stats(df, "text").collect()[0]
        assert r["n_tokens"] == 3
        assert r["n_chars_txt"] == 17
        assert r["digit_ratio"] == pytest.approx(3 / 17)
        assert r["upper_ratio"] == pytest.approx(2 / 17)

    def test_language_detection(self, spark):
        from poppy_spark.spark.text import detect_language

        df = spark.createDataFrame(
            [
                ("the cat and the dog are in the house", "en"),
                ("le chat est dans la maison avec les enfants", "fr"),
                ("der hund ist nicht mit der katze", "de"),
                ("el perro y el gato en la casa", "es"),
                ("zzz qqq xxx", "und"),
            ],
            "text string, expected string",
        )
        rows = detect_language(df, "text").collect()
        for r in rows:
            assert r["lang_guess"] == r["expected"], r["text"]

    def test_quality_score_ranges(self, spark):
        from poppy_spark.spark.text import quality_score

        df = spark.createDataFrame(
            [
                ("the quick brown fox jumps over the lazy dog near the river bank",),
                ("!!! ??? *** ### $$$ %%% ^^^ &&&",),
            ],
            "text string",
        )
        rows = quality_score(df, "text").collect()
        assert rows[0]["quality"] > rows[1]["quality"]

    def test_fingerprint_order_insensitive(self, spark):
        from poppy_spark.spark.text import doc_fingerprint

        df = spark.createDataFrame(
            [("alpha beta gamma",), ("gamma alpha beta",), ("alpha beta delta",)],
            "text string",
        )
        fps = [r["fingerprint"] for r in doc_fingerprint(df, "text").collect()]
        assert fps[0] == fps[1]
        assert fps[0] != fps[2]

    def test_model_seams_plug_in(self, spark):
        """model_factory routes through the per-worker-cached Arrow UDF path
        for all three seams (language, quality, token count)."""
        from poppy_spark.spark.text import (
            detect_language,
            model_token_count,
            quality_score,
        )

        df = spark.createDataFrame(
            [("hello world",), ("bonjour le monde entier",)], "text string"
        )
        langs = dict(
            detect_language(df, "text", model_factory=_fake_lang_model)
            .select("text", "lang_guess")
            .collect()
        )
        assert langs["hello world"] == "xx-2"
        assert langs["bonjour le monde entier"] == "xx-4"

        quals = dict(
            quality_score(df, "text", model_factory=_fake_quality_model)
            .select("text", "quality")
            .collect()
        )
        assert quals["hello world"] == pytest.approx(11 / 100)

        toks = dict(
            model_token_count(df, "text", model_factory=_fake_tokenizer)
            .select("text", "n_tokens")
            .collect()
        )
        assert toks["bonjour le monde entier"] == 4


# module-level so the factories pickle into executor workers
def _fake_lang_model():
    return lambda texts: [f"xx-{len(t.split())}" for t in texts]


def _fake_quality_model():
    return lambda texts: [min(1.0, len(t) / 100.0) for t in texts]


def _fake_tokenizer():
    return lambda texts: [len(t.split()) for t in texts]


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((200, 16)).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache(), vecs

    def test_cosine_topk_exact(self, vectors):
        from poppy_spark.spark.similarity import cosine_topk

        df, vecs = vectors
        queries = df.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
        got = cosine_topk(df, queries, "vec_id", "embedding", "qid", k=5).collect()
        # numpy ground truth
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nv @ nv[:3].T
        for qid in range(3):
            expected = list(np.argsort(-sims[:, qid])[:5])
            mine = [r["id"] for r in sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])]
            assert mine == expected
            assert mine[0] == qid  # self is the nearest

    def test_lsh_topk_recall(self, vectors):
        from poppy_spark.spark.similarity import lsh_topk

        df, vecs = vectors
        queries = df.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
        got = lsh_topk(df, queries, "vec_id", "embedding", "qid", k=5, dim=16, n_planes=6, n_tables=6)
        rows = got.collect()
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nv @ nv[:3].T
        hits = 0
        for qid in range(3):
            expected = set(np.argsort(-sims[:, qid])[:5])
            mine = {r["id"] for r in rows if r["query_id"] == qid}
            hits += len(expected & mine)
        assert hits / 15 >= 0.5  # recall of the scale path vs brute force
        # self must always collide (identical vector, identical buckets)
        for qid in range(3):
            assert qid in {r["id"] for r in rows if r["query_id"] == qid}


class TestBpeIshTokens:
    def test_piece_counting(self, spark):
        from poppy_spark.spark.text import bpe_ish_token_count

        df = spark.createDataFrame(
            [("hello world",), ("foo123bar",), ("a,b.c",), ("",)], "text string"
        )
        got = [r[0] for r in df.select(bpe_ish_token_count(F.col("text"))).collect()]
        # pieces: [hello, world]=2-ish; foo|123|bar=3; a|,|b|.|c=5; empty=0
        assert got[0] >= 2
        assert got[1] == 3
        assert got[2] == 5
        assert got[3] == 0


class TestHotBucketCap:
    def test_hot_bucket_pairs_bounded_recall_kept(self, spark):
        """One text duplicated 3000 times: candidate pairs from the hot
        bucket stay bounded by the cap, while recall on normal duplicated
        pairs is unchanged."""
        from pyspark.sql import functions as F

        from poppy_spark.spark.dedup import lsh_candidate_pairs, minhash_signatures

        normal = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.format_string(
                "unique document number %d with some distinct words %d %d",
                "id", F.col("id") * 7, F.col("id") * 13,
            ).alias("text"),
        )
        dup = normal.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        hot = spark.range(0, 3000).select(
            (F.col("id") + 2_000_000).alias("doc_id"),
            F.lit("accept all cookies to continue to the site content").alias("text"),
        )
        corpus = normal.unionAll(dup).unionAll(hot)
        cap = 32
        sigs = minhash_signatures(corpus, "text", "doc_id", n_perms=32, k=3)
        cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=cap)
        hot_pairs = cands.filter(
            (F.col("id_a") >= 2_000_000) & (F.col("id_b") >= 2_000_000)
        ).count()
        # per band the hot bucket is capped at `cap` members; identical sigs
        # mean the same members are kept in every band
        assert 0 < hot_pairs <= 8 * cap * (cap - 1) // 2
        found = cands.filter(
            (F.col("id_a") < 1_000_000) & (F.col("id_b") - F.col("id_a") == 1_000_000)
        ).count()
        assert found == 200  # zero false negatives on the normal dup pairs

    def test_simhash_cap_keeps_identical_pairs(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.dedup import simhash_near_pairs

        normal = spark.range(0, 100).select(
            F.col("id").alias("doc_id"),
            F.format_string("doc %d words %d %d alpha beta", "id", F.col("id") * 3, F.col("id") * 11).alias("text"),
        )
        dup = normal.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        pairs = simhash_near_pairs(normal.unionAll(dup), "text", "doc_id", max_hamming=3, max_bucket_size=64)
        found = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000).count()
        assert found == 100


class TestConnectedComponents:
    def test_chain_collapses_to_one_component(self, spark):
        from poppy_spark.spark.dedup import duplicate_components

        # chain 1-2-3-4-5 plus separate pair 10-11 plus triangle 20-21-22
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
            "id_a bigint, id_b bigint",
        )
        comp = {r["id"]: r["component"] for r in duplicate_components(pairs).collect()}
        assert {comp[i] for i in (1, 2, 3, 4, 5)} == {1}
        assert {comp[i] for i in (10, 11)} == {10}
        assert {comp[i] for i in (20, 21, 22)} == {20}

    def test_long_chain_converges(self, spark):
        from poppy_spark.spark.dedup import duplicate_components

        n = 40  # diameter 40 chain: exercises multi-round propagation
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
        )
        comp = duplicate_components(pairs, max_iter=50).collect()
        assert {r["component"] for r in comp} == {0}
        assert len(comp) == n + 1

    def test_drop_transitive_survivors(self, spark):
        from poppy_spark.spark.dedup import drop_transitive_duplicates

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(8)], "doc_id bigint, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
        )
        kept = {
            r["doc_id"]
            for r in drop_transitive_duplicates(df, pairs, "doc_id").collect()
        }
        # 2,3 fall to survivor 1; 6 falls to survivor 5; untouched rows pass
        assert kept == {0, 1, 4, 5, 7}


class TestRepetitionStats:
    def test_known_values(self, spark):
        from poppy_spark.spark.text import repetition_stats

        rows = [
            (1, "a b\na b\nc d"),
            (2, "hello world hello world hello world"),
            (3, ""),
            (4, "one"),
            (5, "x\n  \nx\ny"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                round(r["dup_line_frac"], 9),
                round(r["dup_line_char_frac"], 9),
                round(r["top_ngram_char_frac"], 9),
            )
            for r in repetition_stats(df, "text", "doc_id").collect()
        }
        third = round(1 / 3, 9)
        two_thirds = round(2 / 3, 9)
        assert got[1] == (third, third, two_thirds)
        assert got[2] == (0.0, 0.0, 1.0)  # one dominant 2-gram covers all chars
        assert got[3] == (0.0, 0.0, 0.0)  # empty doc: all signals zero
        assert got[4] == (0.0, 0.0, 0.0)  # too short for any 2-gram
        assert got[5] == (third, third, two_thirds)  # blank line ignored

    def test_trigram_and_validation(self, spark):
        import pytest as _pytest

        from poppy_spark.spark.text import repetition_stats

        df = spark.createDataFrame(
            [(1, "p q r p q r p q r s")], "doc_id long, text string"
        )
        r = repetition_stats(df, "text", "doc_id", ngram_n=3).first()
        # 'p q r' occurs 3x (8 trigrams total); 3 grams * 3 chars / 10 word chars
        assert abs(r["top_ngram_char_frac"] - 0.9) < 1e-12
        with _pytest.raises(ValueError):
            repetition_stats(df, "text", "doc_id", ngram_n=0)

    def test_matches_duckdb_on_real_docs(self, spark):
        import duckdb

        from poppy_spark.spark.text import repetition_stats

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = sorted(
            (
                r["doc_id"],
                f"{r['dup_line_frac']:.12g}",
                f"{r['dup_line_char_frac']:.12g}",
                f"{r['top_ngram_char_frac']:.12g}",
            )
            for r in repetition_stats(docs, "text", "doc_id").collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = sorted(
            (r[0], f"{r[1]:.12g}", f"{r[2]:.12g}", f"{r[3]:.12g}")
            for r in con.sql(_REPETITION_ORACLE).fetchall()
        )
        assert got == want


_REPETITION_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
    list_filter(list_transform(str_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines,
    list_filter(str_split_regex(lower(text), '\s+'), w -> w <> '') AS words
  FROM documents
), scal AS (
  SELECT doc_id,
    CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines)) / greatest(len(lines),1)::DOUBLE ELSE 0.0 END AS dup_line_frac,
    CASE WHEN len(lines) > 0 THEN 1.0 - coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))),0) / greatest(coalesce(list_sum(list_transform(lines, x -> length(x))),0),1)::DOUBLE ELSE 0.0 END AS dup_line_char_frac,
    coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS word_chars,
    words
  FROM base
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 2
      THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
      ELSE [] END) AS gram
  FROM base
), cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
), top AS (
  SELECT doc_id, c, gram FROM (
    SELECT doc_id, c, gram, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) rn
    FROM cnt) WHERE rn = 1
)
SELECT s.doc_id, dup_line_frac, dup_line_char_frac,
  coalesce(t.c * length(replace(t.gram, ' ', '')) / greatest(s.word_chars,1)::DOUBLE, 0.0) AS top_ngram_char_frac
FROM scal s LEFT JOIN top t USING (doc_id)
"""


class TestIvf:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((400, 16)).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
        return (
            spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache(),
            vecs,
        )

    def test_centroids_deterministic_and_normalized(self, vectors):
        from poppy_spark.spark.similarity import ivf_train_centroids

        df, _ = vectors
        a = ivf_train_centroids(df, "vec_id", "embedding", 8, iters=3)
        b = ivf_train_centroids(df.repartition(7), "vec_id", "embedding", 8, iters=3)
        assert a.shape == (8, 16)
        assert np.allclose(a, b)  # layout-invariant training sample
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_self_always_retrieved(self, vectors):
        from poppy_spark.spark.similarity import ivf_topk

        df, _ = vectors
        queries = df.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
        rows = ivf_topk(
            df, queries, "vec_id", "embedding", "qid", k=5, n_centroids=16, n_probe=2
        ).collect()
        for qid in range(5):
            mine = {r["id"] for r in rows if r["query_id"] == qid}
            # the query's own vector shares its cell, so probing that cell
            # first must always retrieve it at cosine 1
            assert qid in mine

    def test_recall_vs_bruteforce(self, vectors):
        from poppy_spark.spark.similarity import ivf_topk

        df, vecs = vectors
        queries = df.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
        rows = ivf_topk(
            df, queries, "vec_id", "embedding", "qid", k=5, n_centroids=16, n_probe=8
        ).collect()
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nv @ nv[:10].T
        hits = 0
        for qid in range(10):
            expected = set(np.argsort(-sims[:, qid])[:5])
            mine = {r["id"] for r in rows if r["query_id"] == qid}
            hits += len(expected & mine)
        assert hits / 50 >= 0.6  # probing half the cells

    def test_full_probe_equals_bruteforce(self, vectors):
        from poppy_spark.spark.similarity import cosine_topk, ivf_topk

        df, _ = vectors
        queries = df.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
        exact = cosine_topk(df, queries, "vec_id", "embedding", "qid", k=5)
        full = ivf_topk(
            df, queries, "vec_id", "embedding", "qid", k=5, n_centroids=8, n_probe=8
        )
        want = sorted((r["query_id"], r["rank"], r["id"]) for r in exact.collect())
        got = sorted((r["query_id"], r["rank"], r["id"]) for r in full.collect())
        assert got == want  # probing every cell degenerates to brute force

    def test_validation(self, vectors):
        from poppy_spark.spark.similarity import ivf_train_centroids

        df, _ = vectors
        with pytest.raises(ValueError):
            ivf_train_centroids(df, "vec_id", "embedding", 0)
        with pytest.raises(ValueError):
            ivf_train_centroids(df.limit(3), "vec_id", "embedding", 8)

    def test_cell_stats(self, vectors):
        from poppy_spark.spark.similarity import ivf_cell_stats, ivf_train_centroids

        df, _ = vectors
        cents = ivf_train_centroids(df, "vec_id", "embedding", 8, iters=3)
        stats = ivf_cell_stats(df, "vec_id", "embedding", cents).collect()
        assert 1 <= len(stats) <= 8
        assert sum(r["n_vectors"] for r in stats) == 400
        assert all(r["n_vectors"] > 0 for r in stats)

    def test_hot_cell_cap_bounds_candidates_keeps_recall(self, spark):
        """Planted degenerate cluster: 2000 near-identical vectors collapse
        into one cell.  max_cell_size must bound the candidates a query
        probing that cell scores, while recall for queries over the
        NON-degenerate vectors stays total (their cells are untouched)."""
        from poppy_spark.spark.similarity import (
            cosine_topk,
            ivf_cell_stats,
            ivf_topk,
            ivf_train_centroids,
        )

        rng = np.random.default_rng(11)
        normal = rng.standard_normal((200, 16))
        base = rng.standard_normal(16)
        degen = base + 0.01 * rng.standard_normal((2000, 16))
        rows = [(i, [float(x) for x in normal[i]]) for i in range(200)]
        rows += [(1000 + i, [float(x) for x in degen[i]]) for i in range(2000)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()
        # quantizer trained before the degenerate flood arrived (the
        # production shape: stale centroids + drifting data) — the whole
        # cluster then lands in ONE nearest cell
        cents = ivf_train_centroids(
            df.filter(F.col("vec_id") < 200), "vec_id", "embedding", 16, iters=3
        )
        sizes = {r["cell"]: r["n_vectors"]
                 for r in ivf_cell_stats(df, "vec_id", "embedding", cents).collect()}
        assert max(sizes.values()) >= 2000  # the degenerate cluster concentrated

        cap = 64
        q = df.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"), "embedding")
        capped = ivf_topk(
            df, q, "vec_id", "embedding", "qid", k=5,
            centroids=cents, n_probe=16, max_cell_size=cap,
        )
        # with every cell probed and the hot cell thinned, total scored
        # candidates per query are bounded by capped cells + normal cells
        got = capped.collect()
        exact = cosine_topk(
            df.filter(F.col("vec_id") < 1000), q, "vec_id", "embedding", "qid", k=5
        ).collect()
        hits = 0
        for qid in range(10):
            mine = {r["id"] for r in got if r["query_id"] == qid}
            want = {r["id"] for r in exact if r["query_id"] == qid}
            hits += len(mine & want)
        # queries live among the normal vectors; their neighbors' cells are
        # below the cap, so recall of true (non-degenerate) neighbors holds
        assert hits / 50 >= 0.9

        # and the thinning really bounded the hot cell's survivors
        from poppy_spark.spark.similarity import _ivf_cells_udf, _thin_hot_cells, with_normalized

        c = (
            with_normalized(df, "embedding")
            .select(F.col("vec_id").alias("id"), F.col("vec_n").alias("cv"))
        )
        bc = spark.sparkContext.broadcast(cents.T.copy())
        c_cells = c.withColumn("cell", _ivf_cells_udf(bc, 16, 1)(F.col("cv"))[0])
        thinned = _thin_hot_cells(c_cells, cap)
        per_cell = {r["cell"]: r["n"]
                    for r in thinned.groupBy("cell").agg(F.count("*").alias("n")).collect()}
        # expected cap survivors; allow 3-sigma slack on the binomial draw
        assert max(per_cell.values()) <= cap + 3 * int(cap ** 0.5) + 1
        # determinism: same filter twice -> same survivors
        again = _thin_hot_cells(c_cells, cap)
        assert sorted(r["id"] for r in thinned.collect()) == sorted(
            r["id"] for r in again.collect()
        )


class TestExactCosineGuard:
    def test_exact_raises_above_max_rows(self, spark):
        from poppy_spark.spark.similarity import cosine_near_dup_pairs

        rows = [(i, [float(i), 1.0]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        with pytest.raises(ValueError, match="lsh"):
            cosine_near_dup_pairs(df, "vec_id", "embedding", 0.9, max_rows=10)
        # at or below the bound it runs
        out = cosine_near_dup_pairs(df, "vec_id", "embedding", 0.99, max_rows=30)
        assert out.count() >= 0


class TestTfIdf:
    def test_known_values(self, spark):
        from poppy_spark.spark.text import document_frequency, tf_idf_top_terms

        df = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
            "doc_id long, text string",
        )
        dfreq = {r["word"]: r["df"] for r in document_frequency(df, "text", "doc_id").collect()}
        assert dfreq == {"apple": 2, "banana": 2, "cherry": 1}
        import math

        top = tf_idf_top_terms(df, "text", "doc_id", 1).collect()
        by_doc = {r["doc_id"]: r for r in top}
        # doc 1: apple tf=2 beats banana tf=1 (same idf)
        assert by_doc[1]["word"] == "apple" and by_doc[1]["tf"] == 2
        # doc 2: cherry (rarer) beats banana at equal tf
        assert by_doc[2]["word"] == "cherry"
        want = 1 * (math.log(4.0 / 2.0) + 1.0)
        assert abs(by_doc[2]["tf_idf"] - want) < 1e-12

    def test_validation_and_determinism(self, spark):
        from poppy_spark.spark.text import tf_idf_top_terms

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, tf_idf_top_terms(docs, "text", "doc_id", 2).collect()))
        b = sorted(
            map(tuple, tf_idf_top_terms(docs.repartition(7), "text", "doc_id", 2).collect())
        )
        assert a == b
        with pytest.raises(ValueError):
            tf_idf_top_terms(docs, "text", "doc_id", 0)


def test_ivf_ignores_null_embeddings(spark):
    from poppy_spark.spark.similarity import ivf_topk

    rows = [(i, [float(i % 7 + j) for j in range(8)]) for i in range(100)]
    rows += [(200, None), (201, None)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("qid"), "embedding")
    got = ivf_topk(df, q, "vec_id", "embedding", "qid", k=3, n_centroids=4, n_probe=2)
    rows = got.collect()
    assert rows  # no crash on NULL vectors
    assert all(r["id"] not in (200, 201) for r in rows)


class TestOrderedGroupDedup:
    def test_order_insensitive_input_order_sensitive_sequence(self, spark):
        from poppy_spark.spark.dedup import ordered_group_duplicates

        rows = [
            (1, 0, "hello"), (1, 1, "world"),
            (2, 0, "hello"), (2, 1, "world"),     # dup of 1
            (3, 1, "world"), (3, 0, "hello"),     # same after idx ordering
            (4, 0, "world"), (4, 1, "hello"),     # REVERSED sequence: distinct
            (5, 0, "helloworld"),                 # boundary must not collide
        ]
        df = spark.createDataFrame(rows, "conv long, idx int, text string")
        got = {
            r["canonical"]: r["n_groups"]
            for r in ordered_group_duplicates(df, "conv", "idx", "text").collect()
        }
        assert got == {1: 3, 4: 1, 5: 1}

    def test_matches_duckdb(self, spark):
        import duckdb

        from poppy_spark.spark.dedup import ordered_group_duplicates

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        convs = docs.select(
            (F.col("doc_id") % 100).alias("conv"), F.col("doc_id").alias("idx"), "text"
        )
        both = convs.unionAll(convs.select(F.col("conv") + 10_000, "idx", "text"))
        got = sorted(
            (r["canonical"], r["n_groups"])
            for r in ordered_group_duplicates(both, "conv", "idx", "text").collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = sorted(
            con.sql(
                """
WITH convs AS (
  SELECT doc_id % 100 AS conv, doc_id AS idx, text FROM documents
  UNION ALL
  SELECT doc_id % 100 + 10000, doc_id, text FROM documents
), seq AS (
  SELECT conv, md5(string_agg(text, chr(31) ORDER BY idx, text)) AS digest
  FROM convs GROUP BY conv
)
SELECT MIN(conv) AS canonical, COUNT(*) AS n_groups FROM seq GROUP BY digest
"""
            ).fetchall()
        )
        assert got == want
        assert all(n == 2 for _, n in got)  # every planted copy found


class TestScrubPii:
    def test_redaction_and_flag(self, spark):
        from poppy_spark.spark.text import scrub_pii

        rows = [
            (1, "mail me at john.doe+spam@example.co.uk or x@y.io asap"),
            (2, "server 192.168.001.1 and 8.8.8.8"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "no pii here, just words 123 and v2.0"),
            (5, "a@b is not an email"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["text"], r["pii_found"]) for r in scrub_pii(df, "text").collect()}
        assert got[1] == ("mail me at <EMAIL> or <EMAIL> asap", True)
        assert got[2] == ("server <IP> and <IP>", True)
        assert got[3] == ("call <PHONE> now", True)
        assert got[4] == ("no pii here, just words 123 and v2.0", False)
        assert got[5] == ("a@b is not an email", False)

    def test_separate_output_column(self, spark):
        from poppy_spark.spark.text import scrub_pii

        df = spark.createDataFrame([(1, "x@y.io")], "doc_id long, text string")
        r = scrub_pii(df, "text", output_col="clean").first()
        assert r["text"] == "x@y.io" and r["clean"] == "<EMAIL>" and r["pii_found"]

    def test_null_text_flags_false_not_null(self, spark):
        """NULL text must yield pii_found=False (not NULL): regexp_replace
        propagates NULL and NULL != NULL is NULL, which would silently drop
        those rows from ANY downstream filter on the flag."""
        from poppy_spark.spark.text import scrub_pii

        df = spark.createDataFrame(
            [(1, None), (2, "x@y.io")], "doc_id long, text string"
        )
        out = scrub_pii(df, "text")
        got = {r["doc_id"]: (r["text"], r["pii_found"]) for r in out.collect()}
        assert got[1] == (None, False)
        assert got[2] == ("<EMAIL>", True)
        # both polarities together must cover every row
        kept = out.filter(F.col("pii_found")).count()
        dropped = out.filter(~F.col("pii_found")).count()
        assert kept + dropped == 2


class TestLineDedupCorpus:
    def test_global_first_occurrence_wins(self, spark):
        from poppy_spark.spark.dedup import line_dedup_corpus

        rows = [
            (1, "alpha beta\ncommon footer line\ngamma"),
            (2, "delta\ncommon footer line\nepsilon"),
            (3, "common footer line"),
            (4, "zeta\n\nzeta"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in line_dedup_corpus(df, "text", "doc_id").collect()
        }
        assert got[1] == "alpha beta\ncommon footer line\ngamma"
        assert got[2] == "delta\nepsilon"
        assert got[3] == ""  # all lines were seen earlier
        assert got[4] == "zeta\n"  # in-doc repeat dropped, blank kept

    def test_min_chars_keeps_short_lines(self, spark):
        from poppy_spark.spark.dedup import line_dedup_corpus

        rows = [(1, "- item\nbody text"), (2, "- item\nother body")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in line_dedup_corpus(df, "text", "doc_id", min_chars=10).collect()
        }
        # '- item' (6 chars) is under min_chars: kept verbatim in BOTH docs
        assert got[1] == "- item\nbody text"
        assert got[2] == "- item\nother body"

    def test_layout_invariant(self, spark):
        from poppy_spark.spark.dedup import line_dedup_corpus

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, line_dedup_corpus(docs, "text", "doc_id").collect()))
        b = sorted(
            map(tuple, line_dedup_corpus(docs.repartition(13), "text", "doc_id").collect())
        )
        assert a == b  # argmin over (id, pos) is a total order: layout-proof


class TestLineDedupSkew:
    def test_hot_line_100k_copies_text_never_on_digest_exchange(self, spark):
        """Round-3 verdict #3 evidence: a boilerplate line duplicated 10^5
        times (one hot digest) must (a) dedup to exactly one surviving
        copy, and (b) never ship its TEXT through the digest-keyed
        exchange — only (digest, id, pos) tuples cross it, map-side
        combined.  The assertion reads the executed plan: the child of
        every hashpartitioning exchange that carries line/text columns
        must be keyed by __id (the unique doc key), never __digest."""
        from poppy_spark.spark.dedup import line_dedup_corpus

        n = 100_000
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("unique prefix "), F.col("id").cast("string"),
                F.lit("\naccept cookies to continue\nunique suffix "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        out = line_dedup_corpus(docs, "text", "doc_id")
        survivors = out.filter(F.col("text").contains("accept cookies")).collect()
        assert len(survivors) == 1
        assert survivors[0]["doc_id"] == 0  # global first occurrence
        assert out.count() == n  # every doc comes back

        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange hashpartitioning(__digest" in ln:
                # child node (next line) is the partial agg: digests + the
                # (id, pos) argmin struct only — no text column
                child = lines[i + 1] if i + 1 < len(lines) else ""
                assert "__line" not in child and "__text" not in child, plan


class TestUrlOps:
    def test_url_parts(self, spark):
        from poppy_spark.spark.text import url_parts

        rows = [
            (1, "https://news.example.co/a/b?q=1"),
            (2, "http://sub.deep.example.co/x"),
            (3, "https://localhost/y"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {r["doc_id"]: r for r in url_parts(df, "url").collect()}
        assert got[1]["url_host"] == "news.example.co"
        assert got[1]["url_domain"] == "example.co"
        assert got[1]["url_path"] == "/a/b"
        assert got[2]["url_domain"] == "example.co"
        assert got[3]["url_domain"] == "localhost"

    def test_cap_per_domain(self, spark):
        from pyspark.sql import functions as F

        from poppy_spark.spark.text import cap_per_domain

        rows = [(i, f"https://farm.example.com/p{i}") for i in range(100)]
        rows += [(1000 + i, f"https://site{i}.org/") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = cap_per_domain(df, "url", "doc_id", 5, seed=3)
        by_dom = {r["url_domain"]: r["n"] for r in out.groupBy("url_domain").agg(F.count("*").alias("n")).collect()}
        assert by_dom["example.com"] == 5  # the SEO farm capped
        assert sum(v for d, v in by_dom.items() if d != "example.com") == 10
        # deterministic across layouts
        again = cap_per_domain(df.repartition(7), "url", "doc_id", 5, seed=3)
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )
