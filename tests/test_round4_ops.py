"""Round-4 operator additions: bigram LM scoring, repeated-span detection,
domain mixing, product quantization."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


class TestBigramLm:
    def test_known_probabilities(self, spark):
        from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b"), (3, "b a")], "doc_id long, text string"
        )
        bigrams, unigrams, v = train_bigram_lm(df, "text", "doc_id")
        assert v == 2
        big = {(r["w1"], r["w2"]): r["c12"] for r in bigrams.collect()}
        # corpus bigrams: doc1 {ab, ba, ab}, doc2 {ab}, doc3 {ba}
        assert big == {("a", "b"): 3, ("b", "a"): 2}
        uni = {r["w1"]: r["c1"] for r in unigrams.collect()}
        assert uni == {"a": 3, "b": 2}

        k = 0.1
        scored = {
            r["doc_id"]: r
            for r in score_bigram_lm(df, "text", "doc_id", bigrams, unigrams, v, k).collect()
        }
        p_ab = math.log((3 + k) / (3 + k * 2))
        p_ba = math.log((2 + k) / (2 + k * 2))
        want1 = (2 * p_ab + p_ba) / 3
        assert scored[1]["avg_logp"] == pytest.approx(want1, rel=1e-12)
        assert scored[1]["perplexity"] == pytest.approx(math.exp(-want1), rel=1e-12)
        assert scored[2]["n_bigrams"] == 1
        assert scored[2]["avg_logp"] == pytest.approx(p_ab, rel=1e-12)

    def test_unseen_bigram_and_short_docs(self, spark):
        from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

        train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        bigrams, unigrams, v = train_bigram_lm(train, "text", "doc_id")
        test = spark.createDataFrame(
            [(10, "b b"), (11, "z z"), (12, "single"), (13, "")],
            "doc_id long, text string",
        )
        k = 0.5
        got = {
            r["doc_id"]: r
            for r in score_bigram_lm(test, "text", "doc_id", bigrams, unigrams, v, k).collect()
        }
        # "b b": context b seen (c1=1... bigram (b,b) unseen -> (0+k)/(c1(b)+kV)
        assert got[10]["avg_logp"] == pytest.approx(math.log(0.5 / (1 + 0.5 * 2)))
        # "z z": unseen context -> (0+k)/(0+kV) = 1/V
        assert got[11]["avg_logp"] == pytest.approx(math.log(1 / 2))
        # docs with < 2 words: zero bigrams, NULL score, present in output
        assert got[12]["n_bigrams"] == 0 and got[12]["avg_logp"] is None
        assert got[13]["n_bigrams"] == 0

    def test_in_distribution_scores_higher_than_gibberish(self, spark):
        from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bigrams, unigrams, v = train_bigram_lm(docs, "text", "doc_id")
        # in-distribution = an actual corpus excerpt (seen bigrams); the
        # comparison text is same-length gibberish (all-unseen contexts)
        sample = " ".join(docs.select("text").first()[0].split()[:9])
        probe = spark.createDataFrame(
            [(1, sample), (2, "zxq vnm qqq wke pzt olw nbd fgh jkl")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["avg_logp"]
            for r in score_bigram_lm(probe, "text", "doc_id", bigrams, unigrams, v).collect()
        }
        assert got[1] > got[2]  # in-distribution text is more probable


class TestRepeatedSpans:
    def test_planted_shared_span(self, spark):
        from poppy_spark.spark.spans import repeated_spans, span_texts

        boiler = "all rights reserved contact the site administrator"
        rows = [
            (1, "intro one two three " + boiler),
            (2, boiler + " unrelated tail words here"),
            (3, "totally different content with no overlap at all present"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spans = repeated_spans(df, "text", "doc_id", span_words=7, min_docs=2)
        got = spans.collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_docs"] == 2 and r["n_occurrences"] == 2
        assert (r["first_id"], r["first_pos"]) == (1, 4)
        # join-back recovers the actual text
        t = span_texts(spans, df, "text", "doc_id", 7).collect()[0]
        assert t["span_text"] == boiler

    def test_within_doc_repeat_not_cross_doc(self, spark):
        from poppy_spark.spark.spans import repeated_spans

        df = spark.createDataFrame(
            [(1, "x y z x y z"), (2, "a b c d e f")], "doc_id long, text string"
        )
        # "x y z" repeats inside doc 1 only -> min_docs=2 excludes it
        assert repeated_spans(df, "text", "doc_id", 3, min_docs=2).count() == 0
        one = {
            (r["span_hash"], r["n_occurrences"])
            for r in repeated_spans(df, "text", "doc_id", 3, min_docs=1).collect()
        }
        assert any(n == 2 for _, n in one)  # the within-doc repeat, counted

    def test_stride_still_catches_long_repeats(self, spark):
        """Content-hash striding (winnowing): the shared run is shifted by
        one word between the docs, which positional striding would never
        align — content selection keeps identical span text in both docs
        or neither, so the repeat survives."""
        from poppy_spark.spark.spans import repeated_spans

        words = " ".join(f"w{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, "lead " + words), (2, words + " trail")], "doc_id long, text string"
        )
        got = repeated_spans(df, "text", "doc_id", 10, min_docs=2, stride=4)
        n = got.count()
        assert n >= 1
        # strided result is a subset of the unstrided one
        full = repeated_spans(df, "text", "doc_id", 10, min_docs=2, stride=1)
        assert n < full.count()
        strided_keys = {r["span_hash"] for r in got.collect()}
        full_keys = {r["span_hash"] for r in full.collect()}
        assert strided_keys <= full_keys

    def test_validation(self, spark):
        from poppy_spark.spark.spans import repeated_spans

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            repeated_spans(df, "text", "doc_id", span_words=1)
        with pytest.raises(ValueError):
            repeated_spans(df, "text", "doc_id", stride=0)


class TestProportionalMix:
    def test_keep_rates_math(self):
        from poppy_spark.spark.sampling import mix_keep_rates

        counts = {"web": 8000, "code": 1000, "books": 500}
        # target 60/30/10: books/0.1=5000 < code/0.3~3333? no: 1000/0.3=3333,
        # books 500/0.1=5000, web 8000/0.6=13333 -> code binds (scale 3333)
        rates = mix_keep_rates(counts, {"web": 0.6, "code": 0.3, "books": 0.1})
        assert rates["code"] == pytest.approx(1.0)
        assert rates["web"] == pytest.approx(0.6 * (1000 / 0.3) / 8000)
        assert rates["books"] == pytest.approx(0.1 * (1000 / 0.3) / 500)
        kept = {g: counts[g] * r for g, r in rates.items()}
        total = sum(kept.values())
        assert kept["web"] / total == pytest.approx(0.6)
        assert kept["books"] / total == pytest.approx(0.1)
        # unknown group dropped; zero-weight group dropped
        rates = mix_keep_rates({"a": 10, "b": 10}, {"a": 1.0})
        assert rates == {"a": 1.0, "b": 0.0}

    def test_mix_deterministic_and_proportional(self, spark):
        from poppy_spark.spark.sampling import proportional_mix

        df = spark.range(30_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 7, "web")
            .when(F.col("id") % 10 < 9, "code")
            .otherwise("books")
            .alias("source"),
        )
        out = proportional_mix(df, "doc_id", "source", {"web": 0.5, "code": 0.3, "books": 0.2})
        counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        total = sum(counts.values())
        # books (3000 rows / 0.2 weight) binds -> kept in full
        assert counts["books"] == 3000
        assert counts["web"] / total == pytest.approx(0.5, abs=0.02)
        assert counts["code"] / total == pytest.approx(0.3, abs=0.02)
        # content-determined: identical row set on a different layout
        again = proportional_mix(
            df.repartition(13), "doc_id", "source", {"web": 0.5, "code": 0.3, "books": 0.2}
        )
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

    def test_codebooks_deterministic_shape(self, emb):
        from poppy_spark.spark.similarity import pq_train_codebooks

        dim = len(emb.select("embedding").first()[0])
        a = pq_train_codebooks(emb, "vec_id", "embedding", 4, 32, iters=3)
        b = pq_train_codebooks(emb.repartition(7), "vec_id", "embedding", 4, 32, iters=3)
        assert a.shape == (4, 32, dim // 4)
        assert np.allclose(a, b)

    def test_encode_matches_driver_argmin(self, emb):
        from poppy_spark.spark.similarity import pq_encode, pq_train_codebooks, with_normalized

        books = pq_train_codebooks(emb, "vec_id", "embedding", 4, 16, iters=3)
        codes = {r["id"]: list(r["codes"]) for r in pq_encode(emb, "vec_id", "embedding", books).collect()}
        rows = with_normalized(emb, "embedding").select("vec_id", "vec_n").collect()
        m, n_codes, dsub = books.shape
        for r in rows[:20]:
            x = np.asarray(r["vec_n"])
            want = [
                int(np.argmin(((x[i * dsub:(i + 1) * dsub] - books[i]) ** 2).sum(axis=1)))
                for i in range(m)
            ]
            assert codes[r["vec_id"]] == want

    def test_adc_recall_vs_exact(self, emb):
        from poppy_spark.spark.similarity import (
            cosine_topk,
            pq_encode,
            pq_train_codebooks,
            pq_topk,
        )

        books = pq_train_codebooks(emb, "vec_id", "embedding", 16, 64, iters=5)
        codes = pq_encode(emb, "vec_id", "embedding", books).cache()
        q = emb.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
        # standard recall@k metric: exact top-10 found within approx top-20
        approx = pq_topk(codes, q, "embedding", "qid", 20, books).collect()
        exact = cosine_topk(emb, q, "vec_id", "embedding", "qid", k=10).collect()
        hits = 0
        for qid in {r["query_id"] for r in exact}:
            a = {r["id"] for r in approx if r["query_id"] == qid}
            e = {r["id"] for r in exact if r["query_id"] == qid}
            hits += len(a & e)
        # random gaussian embeddings are PQ's worst case (no cluster
        # structure); 16x64 codebooks must still reach recall@20 >= 0.7
        assert hits / (10 * 10) >= 0.7
        # self-retrieval: the query's own (quantized) vector found
        own = sum(
            1 for r in approx if r["id"] == r["query_id"]
        )
        assert own >= 9

    def test_validation(self, emb):
        from poppy_spark.spark.similarity import pq_train_codebooks

        with pytest.raises(ValueError):
            pq_train_codebooks(emb, "vec_id", "embedding", 0, 16)
        with pytest.raises(ValueError):
            pq_train_codebooks(emb, "vec_id", "embedding", 7, 16)  # 128 % 7 != 0


class TestRound4Properties:
    """Brute-force Python references vs the distributed operators on
    randomized inputs (hypothesis) — the same cross-implementation
    pinning style as the wyhash clean-room oracle."""

    @pytest.fixture(scope="class")
    def _spark(self, spark):
        return spark

    def test_spans_match_bruteforce(self, spark):
        import collections
        import hashlib

        import hypothesis.strategies as st
        from hypothesis import HealthCheck, given, settings

        from poppy_spark.spark.spans import repeated_spans

        word = st.sampled_from(["a", "b", "c", "dd", "ee"])
        doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.lists(doc, min_size=1, max_size=6))
        def check(texts):
            span_w, min_docs = 3, 2
            # brute-force reference
            per_doc = collections.defaultdict(lambda: [0, None])  # key -> [n, min_pos] per doc
            occ = collections.defaultdict(dict)
            for did, t in enumerate(texts):
                ws = [w for w in t.lower().split() if w]
                for i in range(len(ws) - span_w + 1):
                    k = hashlib.md5(" ".join(ws[i:i + span_w]).encode()).hexdigest()
                    n, mp = occ[k].get(did, (0, None))
                    occ[k][did] = (n + 1, i if mp is None else mp)
            want = {}
            for k, docs_d in occ.items():
                if len(docs_d) >= min_docs:
                    fid = min(docs_d)
                    want[k] = (
                        len(docs_d),
                        sum(n for n, _ in docs_d.values()),
                        fid,
                        docs_d[fid][1],
                    )
            df = spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
            got = {
                r["span_hash"]: (
                    r["n_docs"], r["n_occurrences"], r["first_id"], r["first_pos"]
                )
                for r in repeated_spans(df, "text", "doc_id", span_w, min_docs).collect()
            }
            assert got == want

        check()

    def test_lm_scores_match_bruteforce(self, spark):
        import collections
        import math

        import hypothesis.strategies as st
        from hypothesis import HealthCheck, given, settings

        from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

        word = st.sampled_from(["x", "y", "zz"])
        doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.lists(doc, min_size=1, max_size=5))
        def check(texts):
            k = 0.25
            # reference counts
            big = collections.Counter()
            uni = collections.Counter()
            vocab = set()
            toks = {}
            for did, t in enumerate(texts):
                ws = [w for w in t.lower().split() if w]
                toks[did] = ws
                vocab.update(ws)
                for a, b in zip(ws, ws[1:]):
                    big[(a, b)] += 1
                    uni[a] += 1
            v = len(vocab)
            df = spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
            bigrams, unigrams, v_got = train_bigram_lm(df, "text", "doc_id")
            assert v_got == v
            got = {
                r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
                for r in score_bigram_lm(
                    df, "text", "doc_id", bigrams, unigrams, v, k
                ).collect()
            }
            for did, ws in toks.items():
                pairs = list(zip(ws, ws[1:]))
                assert got[did][0] == len(pairs)
                if not pairs:
                    assert got[did][1] is None
                    continue
                want = sum(
                    math.log((big[p] + k) / (uni[p[0]] + k * v)) for p in pairs
                ) / len(pairs)
                assert got[did][1] == pytest.approx(want, rel=1e-12)

        check()

    def test_mix_rates_properties(self):
        import hypothesis.strategies as st
        from hypothesis import given, settings

        from poppy_spark.spark.sampling import mix_keep_rates

        @settings(max_examples=200, deadline=None)
        @given(
            st.dictionaries(
                st.sampled_from("abcdef"), st.integers(1, 10_000), min_size=1
            ),
            st.dictionaries(
                st.sampled_from("abcdef"),
                st.floats(0.01, 10.0, allow_nan=False),
                min_size=1,
            ),
        )
        def check(counts, weights):
            rates = mix_keep_rates(counts, weights)
            assert set(rates) == set(counts)
            assert all(0.0 <= r <= 1.0 for r in rates.values())
            common = [g for g in counts if weights.get(g, 0) > 0]
            if not common:
                assert all(r == 0.0 for r in rates.values())
                return
            # the binding group survives whole
            binding = min(common, key=lambda g: counts[g] / weights[g])
            assert rates[binding] == pytest.approx(1.0)
            # expected kept sizes proportional to target weights
            kept = {g: counts[g] * rates[g] for g in common}
            wsum = sum(weights[g] for g in common)
            ksum = sum(kept.values())
            for g in common:
                assert kept[g] / ksum == pytest.approx(weights[g] / wsum, rel=1e-9)

        check()


class TestIvfPq:
    @pytest.fixture(scope="class")
    def emb2(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

    def test_full_probe_equals_pq_only(self, spark, emb2):
        """Probing EVERY cell degenerates IVF-PQ to plain PQ ADC — same
        codebooks must give the identical ranking."""
        from poppy_spark.spark.similarity import (
            ivf_train_centroids,
            ivfpq_topk,
            pq_encode,
            pq_topk,
            pq_train_codebooks,
        )

        cents = ivf_train_centroids(emb2, "vec_id", "embedding", 8)
        books = pq_train_codebooks(emb2, "vec_id", "embedding", 8, 32, iters=3)
        q = emb2.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
        full = ivfpq_topk(
            emb2, q, "vec_id", "embedding", "qid", k=5,
            n_probe=8, centroids=cents, codebooks=books,
        )
        codes = pq_encode(emb2, "vec_id", "embedding", books)
        plain = pq_topk(codes, q, "embedding", "qid", 5, books)
        want = sorted((r["query_id"], r["rank"], r["id"]) for r in plain.collect())
        got = sorted((r["query_id"], r["rank"], r["id"]) for r in full.collect())
        assert got == want

    def test_recall_vs_exact(self, spark, emb2):
        from poppy_spark.spark.similarity import cosine_topk, ivfpq_topk

        q = emb2.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
        approx = ivfpq_topk(
            emb2, q, "vec_id", "embedding", "qid", k=20,
            n_centroids=16, n_probe=8, m_subspaces=16, n_codes=64,
        ).collect()
        exact = cosine_topk(emb2, q, "vec_id", "embedding", "qid", k=10).collect()
        hits = 0
        for qid in {r["query_id"] for r in exact}:
            a = {r["id"] for r in approx if r["query_id"] == qid}
            e = {r["id"] for r in exact if r["query_id"] == qid}
            hits += len(a & e)
        # half the cells probed + 16x64 PQ on worst-case gaussian data
        assert hits / 100 >= 0.6
        # self-retrieval survives the composition
        own = sum(1 for r in approx if r["id"] == r["query_id"])
        assert own >= 9


def test_lm_scoring_under_zipf_skew(spark):
    """The scoring join keys on w1 — a Zipf-dominant context word ("the"
    in half of all bigrams) must neither break correctness nor the join
    (AQE skew-split handles the hot key; counts stay exact)."""
    import math

    from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

    n = 50_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the "), (F.col("id") % 1000).cast("string"),
            F.lit(" the end"),
        ).alias("text"),
    )
    bigrams, unigrams, v = train_bigram_lm(df, "text", "doc_id")
    uni = {r["w1"]: r["c1"] for r in unigrams.collect()}
    assert uni["the"] == 2 * n  # the hot context: 100k bigram left-sides
    assert v == 1002
    k = 0.1
    out = score_bigram_lm(df, "text", "doc_id", bigrams, unigrams, v, k)
    rows = out.collect()
    assert len(rows) == n
    assert all(r["n_bigrams"] == 3 for r in rows)
    # hand-check one doc: bigrams (the, m), (m, the), (the, end)
    r0 = next(r for r in rows if r["doc_id"] == 0)
    c_the_0 = n // 1000          # ("the", "0") appears once per id%1000==0
    c_0_the = n // 1000
    c_the_end = n
    want = (
        math.log((c_the_0 + k) / (2 * n + k * v))
        + math.log((c_0_the + k) / (c_the_0 + k * v))
        + math.log((c_the_end + k) / (2 * n + k * v))
    ) / 3
    assert r0["avg_logp"] == pytest.approx(want, rel=1e-12)
