"""Standalone job for ``spark-submit --py-files`` scaling evidence.

The north rule requires the pipeline to run via ``spark-submit --py-files``
at two cluster sizes.  This script is the submitted application: it imports
``poppy_spark`` ONLY from the ``--py-files`` archive (the harness submits it
from a neutral cwd so a repo checkout on the path can't mask a packaging
gap), builds the scale-path sketches over a transcripts parquet table, and
prints one JSON line of timings.

Run through bench/submit_scaling.py, or by hand:

    spark-submit --master local[8] \
        --py-files /tmp/poppy_spark_pyfiles.zip \
        --conf spark.sql.shuffle.partitions=8 \
        --conf spark.sql.files.maxPartitionBytes=4m \
        bench/submit_job.py --data /tmp/poppy_scaling_transcripts
"""

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="transcripts parquet path")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    # the import must resolve from the --py-files zip on both driver and
    # executors; a plain `import poppy_spark` here IS the packaging test
    import poppy_spark
    from pyspark.sql import SparkSession

    from poppy_spark.sketches import HllSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.sharded import build_sharded_bloom

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    df = spark.read.parquet(args.data).select("conv_id", "text")
    n_rows = df.count()

    # warm the python workers so we time aggregation, not interpreter spin-up
    build_sketch(df.limit(20000), "conv_id", HllSketch.factory(14))

    def best(fn):
        b = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    def sharded_build():
        sb = build_sharded_bloom(
            df, "text", capacity=n_rows, fpp=0.001, n_shards=32, persist=False
        )
        sb.states.write.format("noop").mode("overwrite").save()

    out = {
        "cores": cores,
        "n_rows": n_rows,
        "pyfiles_origin": poppy_spark.__file__,
        "sharded_sec": round(best(sharded_build), 3),
        "hll_sec": round(best(lambda: build_sketch(df, "conv_id", HllSketch.factory(14))), 3),
    }
    for job in ("sharded", "hll"):
        out[f"{job}_M_turns_per_sec"] = round(n_rows / out[f"{job}_sec"] / 1e6, 3)
    spark.stop()
    print("POPPY_SUBMIT_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
