"""Skew mitigation for long-document workloads (north rule).

Doc cost is dominated by byte length, which is log-uniform over ~4
orders of magnitude with a 1% hot tail — random hash partitioning mixes
giants with dwarves and produces straggler tasks. Mitigations:

  * ``repartition_by_doc_length``: range-partition on (byte_len, salt)
    with partitions >> cores, so same-cost docs land together, the few
    giant docs isolate into their own small tasks, and the scheduler's
    work-stealing over many uniform tasks bounds the tail. The salt
    (deterministic hash of doc_id) spreads equal-length ties.
  * ``salted_group_count``: two-phase (salted partial + final) aggregation
    for hot grouping keys.
  * AQE skew-join splitting is enabled session-wide
    (spark.sql.adaptive.skewJoin.enabled, see session.py).

Lineage rows per partition (operators.extraction) make the effect
measurable: tests assert the max/median partition wall_ms ratio drops
vs. naive partitioning on the skewed corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_byte_len(docs: DataFrame) -> DataFrame:
    """Doc cost proxy: total span text+ref bytes — computed JVM-side."""
    return docs.withColumn(
        "byte_len",
        F.aggregate(
            "spans",
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.octet_length(s["text"]) + F.octet_length(s["media_ref"]),
        ),
    )


def doc_length_stats(docs: DataFrame, sample_fraction: float = 0.05,
                     hot_quantile: float = 0.99, seed: int = 42) -> tuple[float, float]:
    """(median, hot-quantile) byte length from a seeded sample — one
    cheap pass over a fraction of the data instead of a full scan.
    Returns (0, 0) on an (effectively) empty input."""
    sample = with_byte_len(docs.sample(fraction=sample_fraction, seed=seed))
    qs = sample.approxQuantile("byte_len", [0.5, hot_quantile], 0.02)
    if not qs or qs[0] is None:
        return 0.0, 0.0
    return qs[0], qs[1]


def repartition_by_doc_length(docs: DataFrame, num_partitions: int,
                              hot_quantile: float = 0.99,
                              skew_ratio_threshold: float = 10.0,
                              sample_fraction: float = 0.05,
                              stats: tuple[float, float] | None = None,
                              min_partitions: int | None = None) -> DataFrame:
    """Cost-aware, *adaptive* partitioning for the extraction map stage.

    Shuffling 100 TB of document bytes just to balance cost is itself a
    cost — so first decide from sampled stats whether the input is
    skewed at all (p99/median byte length >= skew_ratio_threshold). If
    not, return the input untouched: zero shuffle, source partitioning
    wins. If skewed:

      * naive range-partitioning on byte_len would pack ALL giants into
        the top partition (range balances row counts, not cost) —
        measurably worse than round-robin (see tests/test_skew.py);
      * instead, split at the sampled hot quantile: the cold stream
        round-robins over num_partitions (uniform cost), the hot stream
        round-robins separately (few rows -> ~one giant per partition,
        the irreducible minimum task size), then unionByName (narrow).

    Giant-task wall time collapses to a single doc's cost instead of a
    random number of colliding giants.

    ``stats``: precomputed (median, hot-quantile) — pass it when the
    input DataFrame has expensive upstream stages (the quantile pass is
    an action and would recompute them; callers compute stats on the
    cheap raw scan instead, see job.ExtractionJob.plan).

    ``min_partitions``: small-input parallelism floor. When the caller
    knows the source scan has too few splits for the per-row-expensive
    stage above (job.ExtractionJob.plan's AQE-coalescing guard), the
    floor is honoured by ONE shuffle: the skew path's own repartitions
    already satisfy it, and only the no-skew early-return pays a plain
    ``repartition(min_partitions)``. Previously the guard repartition
    ran *before* this function and the skew path then re-shuffled —
    two full shuffles of the batch where one serves both purposes."""
    med, thr = stats if stats is not None else doc_length_stats(
        docs, sample_fraction, hot_quantile
    )
    if thr <= 0 or med <= 0 or thr / med < skew_ratio_threshold:
        if min_partitions is not None:
            # explicit numPartitions => shuffle origin REPARTITION_BY_NUM,
            # exempt from AQE byte-based coalescing (the guard's point)
            return docs.repartition(min_partitions)
        return docs  # no material skew: don't pay a shuffle for nothing
    df = with_byte_len(docs)
    cold = df.filter(F.col("byte_len") < thr).repartition(num_partitions)
    hot = df.filter(F.col("byte_len") >= thr).repartition(num_partitions)
    return cold.unionByName(hot).drop("byte_len")


def fan_out_small_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Small-scan guard for per-row-expensive stages (shingling, MinHash
    signatures, SimHash): a tiny parquet is one row group and scans as a
    SINGLE partition, serializing all downstream per-row compute on one
    core. Repartition up to the session's default parallelism ONLY when
    the source has fewer files than that — at production scale inputs
    arrive with thousands of splits and this returns the input untouched
    (no shuffle added).

    The probe is PLANNING-FREE: ``inputFiles()`` walks the analyzed
    plan's file relations — an RDD-conversion partition probe would
    force physical planning of the whole upstream plan on the driver
    (latency trap on wide plans; same bound job.ExtractionJob.plan
    uses, and ci_gate greps the package for regressions). A non-file source (an
    in-memory test frame) reports 0 files and counts as "small"; a
    single huge splittable file under-counts its scan splits and pays
    one bounded extra shuffle — acceptable for a guard whose point is
    tiny inputs. The explicit numPartitions makes the shuffle origin
    REPARTITION_BY_NUM, exempt from AQE's byte-based coalescing (which
    is the one-task trap this guard exists to break).

    When the listing shows MANY files, their packed scan-partition
    count is estimated with FilePartition's own bin-packing arithmetic
    (each file charged max(size, openCostInBytes), packed into
    maxPartitionBytes bins): a run dir of hundreds of tiny part files
    used to pass a raw file-count check while the scan coalesced them
    into a handful of splits, serializing the per-row-expensive stage
    (r7 advice, low). Only the under-target listing is stat'ed —
    production-scale inputs short-circuit on the cheap count."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) < target:
        return df.repartition(target)
    # many files != many scan partitions: estimate the packed count
    conf = df.sparkSession.conf
    try:
        max_split = int(conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_split = 128 * 1024 * 1024
    try:
        open_cost = int(conf.get("spark.sql.files.openCostInBytes"))
    except Exception:
        open_cost = 4 * 1024 * 1024
    total = 0
    for f in files:
        p = f[5:] if f.startswith("file:") else f  # file:///p and file:/p both -> /p
        try:
            sz = os.path.getsize(p)
        except OSError:
            return df  # non-local / unstatable source: trust the count
        total += max(sz, open_cost)
    packed = max(1, -(-total // max_split))  # ceil
    if packed < target:
        return df.repartition(target)
    return df


def salted_group_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial agg on
    (key, salt) then final agg on key. Catalyst already does map-side
    partial aggregation; explicit salting additionally splits a single
    hot reduce key across `buckets` reducers."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
