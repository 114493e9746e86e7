"""Dedup cache probe — broadcast fast path (reference's bounded
in-memory recent-history mirror serving cache hits without touching the
store, HistoryManager.cpp:84-115).

Contract: with broadcast_hashes=True the anti-join must broadcast the
committed-hash set and leave the jobs side shuffle-free — the 100 TB
shape where the input streams through map tasks against a small
broadcast hash set.
"""

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.operators.dedup import filter_uncached


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_probe_no_jobs_side_shuffle(spark):
    jobs = spark.range(0, 20_000).select(
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        F.col("id").alias("doc_id"),
    )
    committed = spark.range(0, 500).select(
        F.md5((F.col("id") * 4).cast("string")).alias("content_hash"),
        F.lit(True).alias("success"),
    )
    out = filter_uncached(jobs, committed, broadcast_hashes=True)
    n = out.count()
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # exactly one shuffle exchange, and it sits on the committed side
    # BELOW the BroadcastExchange (the distinct of the small hash set);
    # the jobs subtree (printed first, before the broadcast branch)
    # streams through map tasks shuffle-free
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.index("Exchange hashpartitioning") > plan.index("BroadcastExchange"), plan
    # correctness: every 4th hash in [0, 2000) is cached
    assert n == 20_000 - 500


def test_broadcast_probe_matches_default_path(spark):
    jobs = spark.range(0, 5_000).select(
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        F.col("id").alias("doc_id"),
    )
    committed = spark.range(0, 1_000).select(
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        (F.col("id") % 2 == 0).alias("success"),  # only even ids committed OK
    )
    a = {r["doc_id"] for r in filter_uncached(jobs, committed).collect()}
    b = {r["doc_id"] for r in
         filter_uncached(jobs, committed, broadcast_hashes=True).collect()}
    assert a == b
    # success-only predicate: odd ids < 1000 are NOT cached (P4)
    assert 1 in a and 0 not in a
