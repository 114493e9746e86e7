"""Structured Streaming: incremental extraction equals batch extraction;
redelivery is idempotent; watermarked windowed metrics match batch."""

from xs_vlm_ocr_spark.corpus import gen_docs_df
from xs_vlm_ocr_spark.job import ExtractionJob
from xs_vlm_ocr_spark.streaming.incremental import (
    start_incremental_extraction,
    windowed_doc_metrics,
)


def test_incremental_extraction_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    # two arrival waves as separate files
    gen_docs_df(spark, 40).write.mode("append").parquet(in_dir)
    gen_docs_df(spark, 60).write.mode("append").parquet(in_dir)

    job = ExtractionJob(str(tmp_path / "stream_job"))
    q = start_incremental_extraction(spark, in_dir, job, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = job.read_results(spark)
    # waves overlap on doc_ids 0..39: the content-hash anti-join dedups
    assert got.count() == 60
    batch_job = ExtractionJob(str(tmp_path / "batch_job"))
    batch_job.run(spark, gen_docs_df(spark, 60))
    a = {(r["doc_id"], r["content_hash"], r["full_text"]) for r in got.collect()}
    b = {(r["doc_id"], r["content_hash"], r["full_text"])
         for r in batch_job.read_results(spark).collect()}
    assert a == b

    # new arrivals picked up by a fresh availableNow trigger
    gen_docs_df(spark, 80).write.mode("append").parquet(in_dir)
    q2 = start_incremental_extraction(spark, in_dir, job, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert job.read_results(spark).count() == 80


def test_windowed_metrics_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    ev_dir = str(tmp_path / "ev")
    ev.write.parquet(ev_dir)

    stream = spark.readStream.schema("ts timestamp").parquet(ev_dir)
    agg = windowed_doc_metrics(stream, "ts", "1 hour", "2 hours")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_out").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["window_start_us"], r["n_docs"])
           for r in spark.sql("select * from win_out").collect()}
    exp = {(r["w"], r["n"]) for r in ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("w")
    ).agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == exp


def test_dedup_stream_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: dupes inside the watermark horizon
    are dropped once; state stays bounded by the watermark (the
    forever-running-stream shape of the D1 content-hash dedup)."""
    import pyspark.sql.functions as F

    from xs_vlm_ocr_spark.streaming.incremental import dedup_stream

    rows = [
        ("h1", "2024-01-01 10:00:00"),
        ("h1", "2024-01-01 10:05:00"),   # dupe within watermark -> dropped
        ("h2", "2024-01-01 10:10:00"),
        ("h2", "2024-01-01 10:10:00"),   # exact dupe -> dropped
        ("h3", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "content_hash string, ts_s string").select(
        "content_hash", F.col("ts_s").cast("timestamp").alias("ts")
    )
    src = str(tmp_path / "dd_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("content_hash string, ts timestamp").parquet(src)
    out = dedup_stream(stream, ["content_hash"], "ts", "2 hours")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dd_out").start())
    q.processAllAvailable()
    q.stop()
    got = sorted(r["content_hash"] for r in spark.sql("select * from dd_out").collect())
    assert got == ["h1", "h2", "h3"]
