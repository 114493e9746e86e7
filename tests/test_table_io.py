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


def test_compact_merges_snapshots_and_shrinks_files(spark, tmp_path_factory):
    """compact() rewrites N committed runs as ONE snapshot: same rows,
    single manifest entry, fewer data files (the small-file problem a
    run-per-ingest layout accumulates), old run dirs expired. Bucketed
    tables stay bucketed: the resume-join plan shape survives
    compaction."""
    import glob
    import os

    from pyspark.sql import functions as F

    from xs_vlm_ocr_spark.operators.bucketing import n_shuffle_exchanges
    from xs_vlm_ocr_spark.table_io import CheckpointedTable

    path = str(tmp_path_factory.mktemp("tbl_compact") / "t")
    tbl = CheckpointedTable(path, bucket_key="content_hash", n_buckets=4)
    for run in range(3):
        df = spark.range(run * 100, run * 100 + 100).select(
            F.md5(F.col("id").cast("string")).alias("content_hash"),
            F.col("id").alias("payload"),
        ).repartition(4)
        tbl.append(df, f"run{run}")

    def data_files():
        return [p for p in glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                                     recursive=True)]

    before_rows = {r["payload"] for r in tbl.read(spark).collect()}
    n_before = len(data_files())
    assert len(tbl.committed_runs()) == 3

    run_id = tbl.compact(spark)
    assert run_id is not None
    assert tbl.committed_runs() == [run_id]
    after_rows = {r["payload"] for r in tbl.read(spark).collect()}
    assert after_rows == before_rows and len(after_rows) == 300
    n_after = len(data_files())
    assert n_after < n_before, (n_after, n_before)

    # still bucketed: a key join on the compacted table adds no exchange
    # on the table side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(10).select(
            F.md5(F.col("id").cast("string")).alias("content_hash"))
        n = n_shuffle_exchanges(tbl.read(spark).join(probe, "content_hash"))
        assert n == 1, n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    # idempotent no-op on a single-snapshot table
    assert tbl.compact(spark) is None


def test_bucketed_append_writes_one_file_per_bucket(spark, tmp_path_factory):
    """Each append's hash-repartition means ONE file per bucket per run
    — without it every upstream partition writes its own file per
    bucket (tasks x buckets small files per ingest)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from xs_vlm_ocr_spark.table_io import CheckpointedTable

    path = str(tmp_path_factory.mktemp("tbl_files") / "t")
    tbl = CheckpointedTable(path, bucket_key="content_hash", n_buckets=4)
    df = spark.range(500).select(
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        F.col("id").alias("payload"),
    ).repartition(16)  # many upstream partitions
    tbl.append(df, "r0")
    files = glob.glob(os.path.join(path, "data", "run_id=r0", "*.parquet"))
    assert 0 < len(files) <= 4, files
    assert tbl.read(spark).count() == 500
