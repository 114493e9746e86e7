"""CheckpointedTable: schema evolution across committed snapshots.

Reference analogue: the store migrates in place (ALTER TABLE history ADD
COLUMN content_hash, HistoryManager.cpp:70-77) and old rows keep working.
Here: a run appended with an added column must read back as the UNION
schema (old rows null for the new column) — not silently drop it.
"""

from pyspark.sql import functions as F

from xs_vlm_ocr_spark.table_io import CheckpointedTable


def test_schema_evolution_added_column(spark, tmp_path_factory):
    tbl = CheckpointedTable(str(tmp_path_factory.mktemp("tbl_evo")))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    tbl.append(v1, "run1")

    v2 = spark.createDataFrame(
        [(3, "c", "h3")], "id long, name string, content_hash string"
    )
    tbl.append(v2, "run2")

    out = tbl.read(spark)
    assert set(out.columns) == {"id", "name", "content_hash"}
    rows = {r["id"]: r["content_hash"] for r in out.collect()}
    assert rows == {1: None, 2: None, 3: "h3"}
    # old-schema rows still filterable on the new column
    assert out.filter(F.col("content_hash").isNull()).count() == 2


def test_schema_evolution_dropped_column_reads_union(spark, tmp_path_factory):
    """A later run writing FEWER columns: union schema keeps the column,
    new rows read as null."""
    tbl = CheckpointedTable(str(tmp_path_factory.mktemp("tbl_evo2")))
    tbl.append(
        spark.createDataFrame([(1, "x")], "id long, extra string"), "r1"
    )
    tbl.append(spark.createDataFrame([(2,)], "id long"), "r2")
    out = tbl.read(spark)
    assert set(out.columns) == {"id", "extra"}
    assert {r["id"]: r["extra"] for r in out.collect()} == {1: "x", 2: None}
