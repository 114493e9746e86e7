"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)``: for every left row, attach the most
recent right row with the same key and right.ts <= left.ts.

Implementation is the union-tag trick (composition of built-in ops, no
UDF): tag both sides, union by name, one window sorted by (key, ts,
tag) carrying last_value(right payload, ignorenulls) forward, keep left
rows. Cost: a single shuffle on the key — same as the equi-join Spark
would do anyway; no range-explosion, no per-group Python.

At 100 TB: the window partitions by join key, so skewed keys behave
like any skewed groupBy (salt upstream if one key dominates); both
inputs are pruned to (key, ts, needed payload) before the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Columns out: all of left + payload_cols (null when no prior right
    row exists, or when outside ``tolerance`` e.g. 'INTERVAL 1 HOUR')."""
    lcols = left.columns
    l = left.withColumn("_tag", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = (
        right.select(key, right_ts, *payload_cols)
        .withColumn("_tag", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
        .drop(right_ts)
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in payload_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    r = r.withColumn("_r_ts", F.col("_ts"))
    l = l.withColumn("_r_ts", F.lit(None).cast(r.schema["_r_ts"].dataType))
    unioned = l.select(r.columns).unionByName(r.select(r.columns))

    # right rows (tag 0) sort before left rows at equal ts -> "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in payload_cols and c != "_r_ts"],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_matched_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    out = filled.filter(F.col("_tag") == 1)
    if tolerance is not None:
        in_tol = F.col("_matched_ts") >= F.col("_ts") - F.expr(tolerance)
        out = out.select(
            *[c for c in out.columns if c not in payload_cols],
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload_cols],
        )
    return out.select(*lcols, *payload_cols)


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "INTERVAL 30 MINUTE",
) -> DataFrame:
    """Gap-based sessionization: session breaks when the time since the
    previous event of the same key exceeds ``gap``; session_id is the
    running count of breaks (lag + windowed sum — the batch form of
    streaming session_window)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (prev.isNull() | (F.col(ts_col) > prev + F.expr(gap))).cast("int")
    return events.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(wrun)
    ).drop("_new")
