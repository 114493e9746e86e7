"""As-of join semantics (hand fixtures incl. ties/tolerance/no-match),
sessionization boundaries, and export sinks round-trip."""

from datetime import datetime

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.operators.asof import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right -> null
            (2, "u1", _ts("2024-01-01 12:00:00")),  # matches r1 (exact tie)
            (3, "u1", _ts("2024-01-01 15:00:00")),  # matches r2 (most recent)
            (4, "u2", _ts("2024-01-01 12:30:00")),  # other key
            (5, "u3", _ts("2024-01-01 12:30:00")),  # key with no right rows
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 12:00:00"), 100),
            ("u1", _ts("2024-01-01 14:00:00"), 200),
            ("u2", _ts("2024-01-01 12:00:00"), 300),
        ],
        "k string, rts timestamp, payload int",
    )
    out = {r["id"]: r["payload"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["payload"],
    ).collect()}
    assert out == {1: None, 2: 100, 3: 200, 4: 300, 5: None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 18:00:00"))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00"), 7)], "k string, rts timestamp, payload int"
    )
    with_tol = asof_join(left, right, "k", "ts", "rts", ["payload"],
                         tolerance="INTERVAL 1 HOUR").first()
    without = asof_join(left, right, "k", "ts", "rts", ["payload"]).first()
    assert with_tol["payload"] is None and without["payload"] == 7


def test_sessionize_boundaries(spark):
    ev = spark.createDataFrame(
        [
            ("u1", 1, _ts("2024-01-01 10:00:00")),
            ("u1", 2, _ts("2024-01-01 10:10:00")),  # same session
            ("u1", 3, _ts("2024-01-01 10:40:00")),  # exactly 30min -> same
            ("u1", 4, _ts("2024-01-01 11:20:00")),  # 40min gap -> new
            ("u2", 5, _ts("2024-01-01 10:00:00")),  # other key starts at 1
        ],
        "user string, id int, ts timestamp",
    )
    out = {r["id"]: r["session_seq"] for r in
           sessionize(ev, "user", "ts").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_export_sinks_roundtrip(spark, tmp_path):
    from xs_vlm_ocr_spark.sinks import export_csv, export_markdown, export_text

    df = spark.createDataFrame(
        [("d1", 'text with "quotes", commas\nand a newline'), ("d2", "plain")],
        "doc_id string, full_text string",
    )
    t_dir, m_dir, c_dir = (str(tmp_path / x) for x in ("t", "m", "c"))
    export_text(df, t_dir)
    export_markdown(df, m_dir)
    export_csv(df, c_dir)

    texts = {r["value"] for r in spark.read.text(t_dir).collect()}
    assert "plain" in texts
    md = "\n".join(r["value"] for r in spark.read.text(m_dir).collect())
    assert "# d1" in md and "# d2" in md

    back = spark.read.option("header", True).option("escape", '"') \
        .option("multiLine", True).csv(c_dir)
    got = {r["doc_id"]: r["full_text"] for r in back.collect()}
    assert got["d1"] == 'text with "quotes", commas\nand a newline'
    assert got["d2"] == "plain"


def test_export_csv_bom(spark, tmp_path):
    """UTF-8 BOM parity (reference MainWindow.cpp:1878): every part file
    starts with EF BB BF and round-trips identically."""
    import glob

    from xs_vlm_ocr_spark.sinks import export_csv

    df = spark.createDataFrame(
        [("a", 'quo"te'), ("b", "unié")], "k string, v string"
    )
    out = str(tmp_path / "csv_bom")
    export_csv(df, out, bom=True)
    parts = glob.glob(out + "/part-*.csv")
    assert parts
    for p in parts:
        with open(p, "rb") as fh:
            assert fh.read(3) == b"\xef\xbb\xbf"
    back = spark.read.option("header", True).option("escape", '"').csv(out)
    assert {tuple(r) for r in back.collect()} == {("a", 'quo"te'), ("b", "unié")}
