"""Broadcast-probe operators: Bloom membership as a DataFrame predicate.

The distributed shape of poppy's ``check`` command (load filter once, share
read-only across workers, stream entries — ``poppy/src/bin/poppy.rs:337-410``):
``SparkContext.broadcast`` ships the state once per executor; a vectorized
``pandas_udf`` gathers the k bits per Arrow batch.  No shuffle at all — the
probe is a narrow transformation, usable as an approximate semi-/anti-join
predicate.
"""

from __future__ import annotations

import numpy as np
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
    """A reusable boolean vectorized UDF testing membership in ``filt``.

    Uses an Arrow-native UDF when the runtime has one (Spark 4.1+): the key
    column arrives as a ``pyarrow.Array`` and feeds ``pack_arrow`` directly —
    no Arrow -> pandas object-string -> Arrow round trip."""
    import uuid

    state = filt.dumps() if isinstance(filt, BloomFilter) else bytes(filt)
    bc = spark.sparkContext.broadcast(state)
    cache_key = uuid.uuid4().hex  # per-worker parse-once cache key

    try:
        from pyspark.sql.functions import arrow_udf
    except ImportError:
        arrow_udf = None

    if arrow_udf is not None:

        @arrow_udf("boolean")
        def contains(keys: pa.Array) -> pa.Array:
            f = _get_filter(bc, cache_key)
            from poppy_spark.core.hashkern import pack_arrow

            mat, lens = pack_arrow(keys)
            return pa.array(f.contains_packed(mat, lens))

        return contains

    @pandas_udf("boolean")
    def contains_pd(keys: pd.Series) -> pd.Series:
        f = _get_filter(bc, cache_key)
        arr = pa.Array.from_pandas(keys.astype("string"))
        from poppy_spark.core.hashkern import pack_arrow

        mat, lens = pack_arrow(arr)
        return pd.Series(f.contains_packed(mat, lens))

    return contains_pd


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


def bloom_contains_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    states_df: DataFrame,
    output_col: str = "hit",
) -> DataFrame:
    """Probe each row against *its group's* filter.

    ``states_df`` is the output of ``build_sketch_grouped`` restricted to one
    group column: ``(group, state binary, ...)``.  The whole state dict is
    broadcast (grouped filters are small — one per role/tool/day bucket), so
    the probe stays a narrow, shuffle-free transformation; rows whose group
    has no filter probe False.
    """
    import uuid

    spark = df.sparkSession
    gname = states_df.columns[0] if group_col not in states_df.columns else group_col
    states = {
        r[gname]: bytes(r["state"]) for r in states_df.select(gname, "state").collect()
    }
    bc = spark.sparkContext.broadcast(states)
    cache_key = uuid.uuid4().hex

    @pandas_udf("boolean")
    def contains(groups: pd.Series, keys: pd.Series) -> pd.Series:
        from poppy_spark.core import loads
        from poppy_spark.core.hashkern import pack_arrow

        filters = _FILTER_CACHE.get(cache_key)
        if filters is None:
            filters = {g: loads(raw) for g, raw in bc.value.items()}
            _FILTER_CACHE[cache_key] = filters
        out = np.zeros(len(keys), dtype=bool)
        karr = pa.Array.from_pandas(keys.astype("string"))
        mat, lens = pack_arrow(karr)
        gvals = groups.to_numpy()
        for g in pd.unique(groups):
            f = filters.get(g)
            if f is None:
                continue
            sel = np.flatnonzero(gvals == g)
            out[sel] = f.contains_packed(mat[sel], lens[sel])
        return pd.Series(out)

    c = F.col(col).cast("string")
    return df.withColumn(output_col, contains(F.col(group_col), c))
