"""Cleanup chains, JSON fallback parse, SQL-registered UDFs, retention."""

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.functions import (
    default_prompt_fallback,
    glm_cleanup_chain,
    parse_response_with_fallbacks,
    register_all,
)


def test_glm_cleanup_chain(spark):
    rows = [
        ('<|begin_of_box|>"hello world"<|end_of_box|>',),
        (":  leading colon text ",),
        ('"wrapped"',),
        ("trailing comma,",),
        ("  plain  ",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = [r["c"] for r in df.select(glm_cleanup_chain(F.col("raw")).alias("c")).collect()]
    assert got == ["hello world", "leading colon text", "wrapped", "trailing comma", "plain"]


def test_default_prompt_fallback(spark):
    df = spark.createDataFrame([("",), ("  ",), (None,), ("custom",)], "p string")
    got = [r["c"] for r in
           df.select(default_prompt_fallback(F.col("p"), "OCR_DEFAULT").alias("c")).collect()]
    assert got == ["OCR_DEFAULT", "OCR_DEFAULT", "OCR_DEFAULT", "custom"]


def test_parse_response_with_fallbacks(spark):
    rows = [
        ('{"output": {"text": "A"}}',),
        ('{"choices": [{"message": {"content": "B"}}]}',),
        ('{"output_text": "C"}',),
        ('{"error": {"message": "boom"}}',),
    ]
    df = spark.createDataFrame(rows, "resp string")
    got = [r["c"] for r in
           df.select(parse_response_with_fallbacks(F.col("resp")).alias("c")).collect()]
    assert got == ["A", "B", "C", "ERROR: boom"]


def test_sql_registered_udfs(spark):
    register_all(spark)
    spark.createDataFrame(
        [("d1", "<p>kept paragraph with plenty of characters</p><nav><a href='#'>x</a></nav>")],
        "doc_id string, html string",
    ).createOrReplaceTempView("pages")
    row = spark.sql("SELECT xs_strip_html(html) AS segs FROM pages").first()
    assert row["segs"] == ["kept paragraph with plenty of characters"]

    spark.createDataFrame(
        [("d1", [{"kind": "text", "text": " a  b ", "media_ref": "", "offset": 0},
                 {"kind": "media", "text": "", "media_ref": "m1", "offset": 5}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    ).createOrReplaceTempView("docs_v")
    row = spark.sql(
        "SELECT xs_extract(spans) AS out, xs_merge_text(xs_extract(spans)) AS txt FROM docs_v"
    ).first()
    assert [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["out"]] == [
        ("text", "a b", "", 0), ("media", "", "m1", 1)
    ]
    assert row["txt"] == "a b"


def test_retention_compacts_table(spark, tmp_path):
    from xs_vlm_ocr_spark.operators.history import apply_retention
    from xs_vlm_ocr_spark.table_io import CheckpointedTable

    t = CheckpointedTable(str(tmp_path / "hist"))
    df1 = spark.range(0, 100).selectExpr("id", "timestamp_millis(1700000000000 + id * 1000) AS ts")
    df2 = spark.range(100, 200).selectExpr("id", "timestamp_millis(1700000000000 + id * 1000) AS ts")
    t.append(df1, "r1")
    t.append(df2, "r2")
    assert t.read(spark).count() == 200

    apply_retention(t, spark, 50, ts_col="ts", id_col="id")
    kept = t.read(spark)
    assert kept.count() == 50
    assert kept.agg(F.min("id")).first()[0] == 150  # newest 50 survive
    assert len(t.committed_runs()) == 1  # compacted to one snapshot
