"""Broadcast-probe operators: Bloom membership as a DataFrame predicate.

The distributed shape of poppy's ``check`` command (load filter once, share
read-only across workers, stream entries — ``poppy/src/bin/poppy.rs:337-410``):
``SparkContext.broadcast`` ships the state once per executor; a vectorized
``pandas_udf`` gathers the k bits per Arrow batch.  No shuffle at all — the
probe is a narrow transformation, usable as an approximate semi-/anti-join
predicate.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from poppy_spark.core import BloomFilter

#: per-worker cache of deserialized filters, keyed by broadcast id (avoids
#: re-parsing the state for every Arrow batch)
_FILTER_CACHE: dict = {}


def _get_filter(bc, key: str) -> BloomFilter:
    filt = _FILTER_CACHE.get(key)
    if filt is None:
        from poppy_spark.core import loads

        filt = loads(bytes(bc.value))
        _FILTER_CACHE[key] = filt
    return filt


def bloom_contains_udf(spark: SparkSession, filt: BloomFilter | bytes):
    """A reusable boolean pandas UDF testing membership in ``filt``."""
    import uuid

    state = filt.dumps() if isinstance(filt, BloomFilter) else bytes(filt)
    bc = spark.sparkContext.broadcast(state)
    cache_key = uuid.uuid4().hex  # per-worker parse-once cache key

    @pandas_udf("boolean")
    def contains(keys: pd.Series) -> pd.Series:
        f = _get_filter(bc, cache_key)
        arr = pa.Array.from_pandas(keys.astype("string"))
        from poppy_spark.core.hashkern import pack_arrow

        mat, lens = pack_arrow(arr)
        return pd.Series(f.contains_packed(mat, lens))

    return contains


def bloom_contains(
    df: DataFrame,
    col: str | Column,
    filt: BloomFilter | bytes,
    output_col: str = "hit",
) -> DataFrame:
    """Append a boolean membership column (the ``check`` verb)."""
    spark = df.sparkSession
    udf = bloom_contains_udf(spark, filt)
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(output_col, udf(c.cast("string")))


def bloom_semi_join(df: DataFrame, col: str, filt: BloomFilter | bytes) -> DataFrame:
    """Keep rows whose key is (probably) in the filter — approximate
    LEFT SEMI JOIN with zero false negatives (``check`` without --verify)."""
    return bloom_contains(df, col, filt, "__hit__").filter(F.col("__hit__")).drop("__hit__")


def bloom_anti_join(df: DataFrame, col: str, filt: BloomFilter | bytes) -> DataFrame:
    """Keep rows definitely NOT in the filter (``check --verify`` NOK lines,
    ``bin/poppy.rs:388-393``)."""
    return bloom_contains(df, col, filt, "__hit__").filter(~F.col("__hit__")).drop("__hit__")
