"""Bucketed results table: the dedup-probe join must not re-shuffle the
bucketed (big) side — only the probe side exchanges."""

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.operators.bucketing import (
    n_shuffle_exchanges,
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_skips_big_side_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        committed = spark.range(0, 50_000).select(
            F.md5(F.col("id").cast("string")).alias("content_hash"),
            F.lit(True).alias("success"),
        )
        probe = spark.range(0, 1_000).select(
            F.md5((F.col("id") * 2).cast("string")).alias("content_hash")
        )

        plain = committed.join(probe, "content_hash")
        n_plain = n_shuffle_exchanges(plain)

        write_bucketed(committed, "committed_bucketed", "content_hash", 8)
        bucketed = read_bucketed(spark, "committed_bucketed").join(probe, "content_hash")
        n_bucketed = n_shuffle_exchanges(bucketed)

        # plain SMJ shuffles both sides; bucketed shuffles only the probe
        assert n_plain == 2, n_plain
        assert n_bucketed == 1, n_bucketed

        # and the join is still correct
        expected = {r["content_hash"] for r in committed.join(probe, "content_hash")
                    .select("content_hash").collect()}
        got = {r["content_hash"] for r in bucketed.select("content_hash").collect()}
        assert got == expected and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS committed_bucketed")
