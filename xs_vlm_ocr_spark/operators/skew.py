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


def repartition_by_doc_length(docs: DataFrame, num_partitions: int,
                              drop_helper: bool = True) -> DataFrame:
    df = with_byte_len(docs).withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000))
    )
    out = df.repartitionByRange(num_partitions, "byte_len", "_salt")
    return out.drop("byte_len", "_salt") if drop_helper else out.drop("_salt")


def salted_group_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial agg on
    (key, salt) then final agg on key. Catalyst already does map-side
    partial aggregation; explicit salting additionally splits a single
    hot reduce key across `buckets` reducers."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
