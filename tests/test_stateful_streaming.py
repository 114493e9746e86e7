"""applyInPandasWithState: totals must accumulate across micro-batches."""

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.streaming.stateful import running_totals_stream


def test_running_totals_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "source", "n_chars"
    )
    # wave 1 then wave 2 as separate files -> separate micro-batches
    base.limit(100).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("source string, n_chars long").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        running_totals_stream(stream, "source", "n_chars")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .start()
    )
    q.processAllAvailable()
    wave1 = {
        r["source"]: r["running_docs"]
        for r in spark.sql(
            "SELECT source, max(running_docs) running_docs FROM totals_out GROUP BY 1"
        ).collect()
    }

    base.limit(100).coalesce(1).write.mode("append").parquet(in_dir)
    q.processAllAvailable()
    q.stop()
    final = {
        r["source"]: r["running_docs"]
        for r in spark.sql(
            "SELECT source, max(running_docs) running_docs FROM totals_out GROUP BY 1"
        ).collect()
    }

    exp = {r["source"]: r["n"] for r in
           base.limit(100).groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # state carried across batches: final totals are exactly double wave1
    assert final == {k: 2 * v for k, v in exp.items()}
    assert wave1 == exp
