"""Gap-based sessionization of event / conversation-turn streams.

A session breaks when the gap to the previous event of the same key
exceeds ``gap_seconds``.  Pure window expressions — one shuffle
(hash-partition by key) + in-partition sort, whole-stage codegen, no
Python — and the result is a closed-form function of (key, ts) so any
ANSI-SQL engine reproduces it row-for-row:

    SUM(CASE WHEN ts - LAG(ts) > gap THEN 1 ELSE 0 END)
        OVER (PARTITION BY key ORDER BY ts)

Scale notes: the window partitions by the session key, so skewed keys
(the north rule's hot conversation) concentrate in one task — cap with
the same salting used for builds if a single key's events exceed task
memory, accepting split sessions at salt boundaries, or pre-filter the
hot key into its own pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    output_col: str = "session_id",
) -> DataFrame:
    """``df`` + ``output_col``: 0-based session index per key.

    Ties on ``ts`` within a key order by all remaining columns via the
    timestamp only — equal timestamps always share a session (gap 0),
    so the assignment is deterministic regardless of tie order.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # microsecond integer epochs: full precision, and exact cross-engine
    # (fractional-seconds doubles round differently at gap boundaries);
    # NTZ routes through TIMESTAMP (session-tz interpretation)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap > gap_seconds * 1_000_000, 1).otherwise(0)
    return df.withColumn(
        output_col, F.sum(new_session).over(w).cast("long")
    )


def session_stats(
    sessions: DataFrame,
    key_col: str,
    ts_col: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session (key, session_id, n_events, t_start, t_end,
    duration_sec) — the rollup view."""
    return sessions.groupBy(key_col, session_col).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (
            (
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            )
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )


def rolling_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    prefix: str = "w_",
) -> DataFrame:
    """Trailing event-time rolling aggregates per key: for every row, the
    count / sum / mean of ``value_col`` over the last ``window_seconds``
    of the SAME key (inclusive of the current row and of ties at the same
    microsecond) — the rate/feature shape for event and transcript streams
    ("tool calls in the last hour", "mean turn length over 5 minutes").

    Pure window expressions over a microsecond-integer event time: one
    shuffle (hash by key) + one in-partition sort, whole-stage codegen, no
    Python.  RANGE framing on integer microseconds makes the semantics
    closed-form, so any ANSI engine reproduces every row (DuckDB: ``RANGE
    BETWEEN N PRECEDING AND CURRENT ROW`` over ``epoch_us(ts)``).  Skewed
    keys concentrate in one task like every per-key window — pre-split a
    pathological key or bound it upstream.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    v = F.col(value_col)
    return (
        df.withColumn(f"{prefix}count", F.count(v).over(w))
        .withColumn(f"{prefix}sum", F.sum(v).over(w))
        .withColumn(f"{prefix}avg", F.avg(v).over(w))
    )
