"""Structured Streaming: incremental extraction equals batch extraction;
redelivery is idempotent; watermarked windowed metrics match batch."""

from xs_vlm_ocr_spark.corpus import gen_docs_df
from xs_vlm_ocr_spark.job import ExtractionJob
from xs_vlm_ocr_spark.streaming.incremental import (
    start_incremental_extraction,
    stream_docs,
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
