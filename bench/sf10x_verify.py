"""Round-4 (verdict #8): run the corpus-pipeline family at 10x the sf0.1
document scale WITH its DuckDB oracles — the recorded "sf1" verification.

No sf1 testdata exists in the sandbox, so the 10x corpora are synthesized
deterministically from sf0.1 documents (5,000 -> 50,000 docs):

* ``distinct`` corpus — each of 10 replicas carries a replica-tag header
  line, so all 50k texts are DISTINCT: exact_dedup_groups / tfidf_top_terms
  / line_dedup do genuine 10x-cardinality work (and the 10 replica header
  lines are 5,000x-hot line-dedup digests — the planted-skew shape).
* ``copies`` corpus — 10 EXACT replicas under shifted ids: the full
  corpus_clean_pipeline sees 10x input rows; its exact-dedup front end
  collapses the replicas, so the (quadratic-oracle) near-dup stage runs at
  1x cardinality and the unchanged driver oracle stays feasible.

The entry ``queries()`` callables and ``oracle_sql()`` strings run
VERBATIM against the generated directory — same comparison as the driver
(row count, column names, order-insensitive values).  Output: one JSON
line with per-query wall time and match verdicts; the driver-facing copy
lands in BENCH/SF10X_r04.json.

Usage: python bench/sf10x_verify.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/poppy_sf10x"
REPLICAS = 10


def _canon(cols, rows):
    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def _generate(spark) -> tuple[str, str]:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for r in range(REPLICAS):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.concat(
                    F.lit(f"replica r{r} header line\n"), F.col("text")
                ).alias("text"),
                "lang",
                "source",
            )
        )
    distinct = parts[0]
    for p in parts[1:]:
        distinct = distinct.unionAll(p)
    distinct = distinct.withColumn("n_chars", F.length("text"))
    d_dir = f"{WORK}/distinct"
    distinct.repartition(32).write.mode("overwrite").parquet(f"{d_dir}/documents.parquet")

    copies = None
    for r in range(REPLICAS):
        p = docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        copies = p if copies is None else copies.unionAll(p)
    c_dir = f"{WORK}/copies"
    copies.repartition(32).write.mode("overwrite").parquet(f"{c_dir}/documents.parquet")
    return d_dir, c_dir


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from poppy_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="poppy-sf10x-verify", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    d_dir, c_dir = _generate(spark)
    gen_sec = round(time.perf_counter() - t0, 2)

    plan = [
        ("exact_dedup_groups", d_dir),
        ("tfidf_top_terms", d_dir),
        ("line_dedup", d_dir),
        ("corpus_clean_pipeline", c_dir),
    ]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    ok_all = True
    for name, sf_dir in plan:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        got_cols = list(df.columns)
        got_rows = [tuple(r) for r in df.collect()]
        spark_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        res = con.execute(oracles[name])
        exp_cols = [d[0] for d in res.description]
        exp_rows = res.fetchall()
        duck_sec = round(time.perf_counter() - t0, 2)
        gc, gr = _canon(got_cols, got_rows)
        ec, er = _canon(exp_cols, exp_rows)
        match = gc == ec and gr == er
        ok_all = ok_all and match
        results[name] = {
            "rows": len(gr),
            "match": match,
            "spark_sec": spark_sec,
            "duckdb_sec": duck_sec,
        }
        con.close()

    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            boot_id = fh.read().strip()
    except OSError:
        boot_id = None
    out = {
        "metric": "corpus-pipeline family verified at 10x sf0.1 (50k docs)",
        "n_docs": 50_000,
        "generate_sec": gen_sec,
        "results": results,
        "all_match": ok_all,
        "cpus": int(cpus),
        "boot_id": boot_id,
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
