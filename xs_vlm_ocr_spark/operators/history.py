"""History / metrics query surface (reference §2.3, §2.5, §2.7).

The reference's only genuine SQL surface: dynamic-predicate filtered
count + keyword search + ORDER BY ts DESC LIMIT/OFFSET pagination over
the SQLite history table (reference src/managers/HistoryManager.cpp:
117-229), top-N retention (:330-363), latest-successful-wins cache
lookup (:466-508), point lookup (:231-273).

Implemented as generic DataFrame combinators (column names are
parameters) so the identical operator code serves the engine's own
results table AND the DuckDB-oracle-checked driver tables. Everything
here is pure Catalyst — filters and projections push down to the
parquet scan, pagination is a window + filter, retention is an
anti-join; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_history(
    df: DataFrame,
    ts_col: str = "ts",
    start=None,
    end=None,
    keyword: str | None = None,
    keyword_cols: tuple[str, ...] = ("full_text", "model_name"),
) -> DataFrame:
    """Dynamic WHERE build (reference P1, HistoryManager.cpp:117-151):
    ts range AND case-insensitive keyword OR across text columns."""
    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts_col) <= F.lit(end))
    if keyword:
        kw = keyword.lower()
        pred = None
        for c in keyword_cols:
            p = F.lower(F.col(c)).contains(F.lit(kw))
            pred = p if pred is None else (pred | p)
        out = out.filter(pred)
    return out


def filtered_count(df: DataFrame, **kwargs) -> DataFrame:
    """COUNT(*) over the dynamic predicate (reference A1) as a 1-row DF."""
    return filter_history(df, **kwargs).agg(F.count(F.lit(1)).alias("total"))


def paginate(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    page: int,
    page_size: int,
    descending: bool = True,
) -> DataFrame:
    """ORDER BY .. DESC LIMIT/OFFSET pagination (reference O1,
    HistoryManager.cpp:186-201), deterministic under a total order
    (explicit tiebreak column).

    Scale shape: the top ``(page+1) * page_size`` rows come from
    orderBy+limit — TakeOrderedAndProject, parallel per-partition top-k
    merged driver-side — and only that page-bounded set is ranked by the
    row_number window (a single-partition pass over <= hi rows, not over
    the table). Deep offsets are still O(page) rows on the driver; at
    10^12 rows paginate by keyset instead — see ``page_after``."""
    oc = F.desc(order_col) if descending else F.asc(order_col)
    tc = F.desc(tiebreak_col) if descending else F.asc(tiebreak_col)
    lo = page * page_size
    hi = lo + page_size
    w = Window.orderBy(oc, tc)
    return (
        df.orderBy(oc, tc).limit(hi)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > lo)
        .drop("_rn")
    )


def page_after(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    last_seen: tuple | None,
    page_size: int,
) -> DataFrame:
    """Keyset pagination — the O(page) form that survives 10^12 rows:
    WHERE (ts, id) < (last_ts, last_id) ORDER BY ts DESC, id DESC LIMIT n."""
    out = df
    if last_seen is not None:
        ts_v, id_v = last_seen
        out = out.filter(
            (F.col(order_col) < F.lit(ts_v))
            | ((F.col(order_col) == F.lit(ts_v)) & (F.col(tiebreak_col) < F.lit(id_v)))
        )
    return out.orderBy(F.desc(order_col), F.desc(tiebreak_col)).limit(page_size)


def retention_topn(df: DataFrame, n: int, ts_col: str, id_col: str) -> DataFrame:
    """Keep only the newest N rows (reference O2, DELETE-all-but-newest,
    HistoryManager.cpp:330-363).

    Scale shape: the winner KEYS come from orderBy(desc).limit(n) —
    TakeOrderedAndProject, i.e. each partition computes its own top-n
    and the driver merges n-sized heaps (parallel partial top-k; n is a
    retention count, so driver-side n rows is trivial) — then a
    broadcast semi-join pulls the full winner rows. The previous
    unpartitioned row_number window was a single-reducer GLOBAL SORT of
    the whole table at 10^12 rows; same fix family as exact_dedup's
    window removal. Requires (ts_col, id_col) to be a unique key, which
    the engine's 128-bit result id guarantees (job.stamp_results) —
    with duplicate (ts, id) keys ALL duplicates of a winner pass the
    semi-join (more than n rows kept), and rows with a NULL ts or id
    never match the equi-join and are dropped; callers outside the
    engine's stamped results must ensure uniqueness and non-null keys.
    Plan pinned by tests/test_results_history.py."""
    winners = (
        df.select(ts_col, id_col)
        .orderBy(F.desc(ts_col), F.desc(id_col))
        .limit(n)
    )
    return df.join(F.broadcast(winners), [ts_col, id_col], "left_semi")


def apply_retention(table, spark, n: int, ts_col: str = "ts", id_col: str = "id") -> None:
    """Enforce top-N retention on a checkpointed table: keep the newest
    N rows and rewrite as one compacted snapshot (reference O2+K6,
    HistoryManager.cpp:330-363 + VACUUM :391-395).

    The rewrite plan is built from ``read_raw`` (plain parquet over the
    committed run dirs, bypassing the catalog): a bucketed ``replace``
    must never insert into the catalog table its own plan is scanning
    (self-insert — replace() now refuses such plans outright). For
    TIME-based retention prefer ``table.expire_before(spark, cutoff)``:
    an O(metadata) manifest flip, no rewrite at all."""
    import uuid as _uuid

    df = table.read_raw(spark)
    if df is None:
        return
    table.replace(retention_topn(df, n, ts_col, id_col), f"retain-{_uuid.uuid4().hex[:8]}")


def latest_per_key(df: DataFrame, key_cols: list[str], ts_col: str, tiebreak_col: str) -> DataFrame:
    """Most-recent-wins dedup (reference O4/D1 cache lookup,
    HistoryManager.cpp:480-483): row_number over (key) ordered desc.

    Deliberately NOT a max_by(full row) aggregation: the rank<=1 filter
    triggers WindowGroupLimit (partial per-key top-1 below the
    exchange), so the window already combines map-side like an
    aggregate would — and the max_by form measured ~30% SLOWER at sf1.0
    (struct-of-all-columns construction + interpreted struct compares
    per row vs the codegen'd group-limit; r8 A/B, fresh processes)."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def point_lookup(df: DataFrame, id_col: str, value) -> DataFrame:
    """Point read (reference J4, HistoryManager.cpp:231-273); with an
    id-sorted/partitioned table this prunes to one file via min/max."""
    return df.filter(F.col(id_col) == F.lit(value))


def preview_projection(df: DataFrame, text_col: str, n_chars: int = 50) -> DataFrame:
    """List-view preview (reference P6, MainWindow.cpp:2130-2140):
    newline->space then first n chars."""
    return df.withColumn(
        "preview", F.substring(F.regexp_replace(F.col(text_col), "\n", " "), 1, n_chars)
    )


def day_end_clamp(col):
    """endTime -> 23:59:59 of that day (reference MainWindow.cpp:2112-2114)."""
    return F.date_trunc("day", col) + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 SECOND")
