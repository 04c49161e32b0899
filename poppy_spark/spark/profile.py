"""One-pass data profiling built from the mergeable-sketch family.

``build_sketches_multi`` updates ONE sketch per requested column inside a
single ``mapInArrow`` scan — profiling N columns costs one pass over the
data plus one tiny (name-keyed) state merge, not N passes.  ``profile_table``
layers the standard data-quality report on top: exact row/null counts and
min/max from one JVM aggregate (a second shuffle-free scan), plus HLL
distinct estimates and KLL quantiles from the sketch pass.  Two scans
total for any column count — the shape that survives a 100 TB table.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from poppy_spark.sketches.base import Sketch


def build_sketches_multi(
    df: DataFrame,
    specs: Mapping[str, tuple[str, Callable[[], Sketch]]],
    int_keys: str = "string",
) -> dict[str, tuple[Sketch, int]]:
    """Build one sketch per spec in a SINGLE pass.

    ``specs`` maps an output name to ``(column, factory)``.  Nulls are
    dropped per column before the update (each sketch sees that column's
    non-null values), and the returned dict carries ``(sketch,
    non_null_count)`` per name.  Physical shape: one mapInArrow scan
    emitting one (name, state) row per (partition, spec); the merge groups
    by name — states are KBs, so the collect is O(specs).
    """
    import pandas as pd
    import pyarrow as pa

    from poppy_spark.spark.agg import _key_expr, _z_dumps, _z_loads

    names = list(specs)
    if not names:
        raise ValueError("specs must name at least one column")
    # null-preserving key expressions: xxhash64(NULL) is a constant, not
    # NULL, so the prehash path must be gated or nulls would count as one
    # distinct value
    sel = df.select(
        *[
            F.when(
                F.col(col).isNotNull(), _key_expr(df, col, fac, int_keys)
            ).alias(name)
            for name, (col, fac) in specs.items()
        ]
    )
    factories = {n: specs[n][1] for n in names}

    def update(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sks = {}
        for n in names:
            sk = factories[n]()
            sk.int_keys = int_keys
            sks[n] = sk
        counts = dict.fromkeys(names, 0)
        for batch in batches:
            for i, n in enumerate(names):
                arr = batch.column(i).drop_null()
                if len(arr):
                    sks[n].update_arrow(arr)
                    counts[n] += len(arr)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array([_z_dumps(sks[n]) for n in names], type=pa.binary()),
                pa.array([counts[n] for n in names], type=pa.int64()),
            ],
            ["name", "state", "n_rows"],
        )

    states = sel.mapInArrow(update, "name string, state binary, n_rows long")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["name"].iloc[0]
        cls = type(factories[name]())
        sk = None
        for raw in pdf["state"]:
            part = _z_loads(cls, raw)
            if sk is None:
                sk = part
            else:
                sk.merge(part)
        sk.finalize_merge()
        return pd.DataFrame(
            {"name": [name], "state": [sk.dumps()], "n_rows": [int(pdf["n_rows"].sum())]}
        )

    merged = states.groupBy("name").applyInPandas(
        merge, "name string, state binary, n_rows long"
    )
    out = {}
    for r in merged.collect():
        cls = type(factories[r["name"]]())
        out[r["name"]] = (cls.loads(bytes(r["state"])), int(r["n_rows"]))
    return out


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    hll_p: int = 14,
    kll_k: int = 200,
) -> DataFrame:
    """Per-column data-quality profile: exact ``n_rows`` / ``n_nulls`` /
    min/max (numeric as doubles, strings as strings) from one JVM
    aggregate, plus HLL distinct estimates and KLL medians (numeric only)
    from one multi-sketch pass — two scans total regardless of column
    count.

    Returns one row per column:
    ``(column, n_rows, n_nulls, distinct_est, p50, min_num, max_num,
    min_str, max_str)`` with NULL where a stat does not apply.
    """
    from poppy_spark.sketches import HllSketch, KllSketch

    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in schema]
    if unknown:
        raise ValueError(f"columns not in DataFrame: {unknown}")

    specs: dict[str, tuple[str, Callable[[], Sketch]]] = {}
    for c in cols:
        specs[f"hll:{c}"] = (c, HllSketch.factory(hll_p))
        if isinstance(schema[c], _NUMERIC):
            specs[f"kll:{c}"] = (c, KllSketch.factory(kll_k))
    sketches = build_sketches_multi(df, specs)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls:{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"min:{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"max:{c}"))
        elif isinstance(schema[c], T.StringType):
            aggs.append(F.min(F.col(c)).alias(f"smin:{c}"))
            aggs.append(F.max(F.col(c)).alias(f"smax:{c}"))
    exact = df.agg(*aggs).first()

    rows = []
    for c in cols:
        hll, _seen = sketches[f"hll:{c}"]
        kll_entry = sketches.get(f"kll:{c}")
        rows.append(
            (
                c,
                int(exact["__n"]),
                int(exact[f"nulls:{c}"] or 0),
                int(hll.result()),
                float(kll_entry[0].quantile(0.5)) if kll_entry and kll_entry[1] else None,
                exact[f"min:{c}"] if f"min:{c}" in exact.__fields__ else None,
                exact[f"max:{c}"] if f"max:{c}" in exact.__fields__ else None,
                exact[f"smin:{c}"] if f"smin:{c}" in exact.__fields__ else None,
                exact[f"smax:{c}"] if f"smax:{c}" in exact.__fields__ else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows bigint, n_nulls bigint, distinct_est bigint, "
        "p50 double, min_num double, max_num double, min_str string, max_str string",
    )
