"""Checkpointed append-only table: parquet + atomic manifest.

Thin stand-in for the Iceberg tables the north rule specifies (snapshot
commit, resumability, lineage metrics table) — the sandbox has no Iceberg
jars, so the same semantics are provided by:

  * each ``append(df, run_id)`` writes parquet under
    ``<path>/data/run_id=<id>/`` and then commits by atomically rewriting
    ``<path>/manifest.json`` (write-temp + os.replace);
  * ``read`` sees ONLY committed runs — a crashed job's partial files are
    invisible, exactly like an uncommitted Iceberg snapshot;
  * resume = anti-join against ``read()`` (operators.dedup).

On a real cluster this class is replaced 1:1 by
``df.writeTo(tbl).append()`` on an Iceberg catalog; every caller goes
through this interface so the swap is local.

Reference analogue: the SQLite history store + content-hash cache commit
(reference src/managers/HistoryManager.cpp:275-328, 433-508).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class CheckpointedTable:
    """``bucket_key`` opts a table into BUCKETED layout: every run is
    written ``bucketBy(n_buckets, key).sortBy(key)`` through the session
    catalog (an external table over the same ``data/`` dir, partitioned
    by run_id), so a recurring join on the key — the daily resume
    anti-join against a committed table that grows toward 10^12 rows —
    reads the committed side PRE-PARTITIONED: zero Exchange on the big
    side, only the new batch shuffles (tests/test_bucketing.py pins the
    plan). The manifest stays the ONLY commit point: uncommitted
    ``run_id=`` partitions are pruned out of every read, so crash
    atomicity is unchanged. On a real deployment this is the Iceberg
    ``bucket(N, content_hash)`` partition transform — same 1:1 swap as
    the rest of this class; reference analogue: ``idx_content_hash``,
    the reference's index on its cache-probe key
    (src/managers/HistoryManager.cpp:70-77).

    The default (bucket_key=None) keeps plain parquet appends and
    mergeSchema evolution; bucketed tables trade schema evolution for
    layout (exactly Iceberg's trade until a spec update)."""

    def __init__(self, path: str, schema: T.StructType | None = None,
                 bucket_key: str | None = None, n_buckets: int = 32) -> None:
        self.path = path
        self.schema = schema
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets
        self.data_dir = os.path.join(path, "data")
        self.manifest_path = os.path.join(path, "manifest.json")
        # deterministic name: a NEW session (resume after crash) derives
        # the same catalog entry from the path and re-registers it
        digest = __import__("hashlib").md5(path.encode()).hexdigest()[:12]
        self.table_name = f"ckpt_{digest}"

    # ------------------------------------------------------------- manifest
    def committed_runs(self) -> list[str]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return json.load(f)["runs"]

    def _commit(self, run_id: str) -> None:
        runs = self.committed_runs()
        if run_id not in runs:
            runs.append(run_id)
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"runs": runs}, f)
        os.replace(tmp, self.manifest_path)  # atomic commit point

    # ----------------------------------------------------------------- I/O
    def run_dir(self, run_id: str) -> str:
        return os.path.join(self.data_dir, f"run_id={run_id}")

    def _ensure_registered(self, spark: SparkSession,
                           schema: T.StructType) -> None:
        """Catalog registration for the bucketed layout. The in-memory
        catalog dies with the session, so a resumed job re-creates the
        SAME external table (name derived from path) over the existing
        data dir and recovers its run_id partitions — the files, not the
        catalog, are the durable artifact (like an Iceberg metadata
        re-read)."""
        if spark.catalog.tableExists(self.table_name):
            return
        # pre-create the location: CREATE TABLE over a missing dir logs a
        # noisy (benign) FileStreamSink FileNotFoundException warning
        os.makedirs(self.data_dir, exist_ok=True)
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in schema.fields if f.name != "run_id"
        )
        spark.sql(
            f"CREATE TABLE {self.table_name} ({cols}, run_id string) "
            f"USING parquet PARTITIONED BY (run_id) "
            f"CLUSTERED BY ({self.bucket_key}) "
            f"SORTED BY ({self.bucket_key}) INTO {self.n_buckets} BUCKETS "
            f"LOCATION '{self.data_dir}'"
        )
        if os.path.exists(self.data_dir):
            spark.sql(f"MSCK REPAIR TABLE {self.table_name}")

    def append(self, df: DataFrame, run_id: str) -> None:
        """Write then commit. Crash before the manifest rewrite leaves the
        table unchanged (the partial run dir is garbage, never read)."""
        if self.bucket_key is None:
            df.write.mode("overwrite").parquet(self.run_dir(run_id))
        else:
            self._bucketed_write(df, run_id)
        self._commit(run_id)

    def _bucketed_write(self, df: DataFrame, run_id: str) -> None:
        """One bucketed snapshot write. The hash-repartition to n_buckets
        on the key is load-bearing: Spark's bucket id is
        Murmur3Hash(key) pmod n_buckets — the SAME function
        repartition(n, col) uses — so each write task holds exactly one
        bucket's rows and emits ONE file per bucket (without it, every
        upstream partition writes its own file per bucket:
        tasks x buckets small files per run — measured 1000+ files for
        one 5k-doc append). Iceberg analogue:
        write.distribution-mode=hash on a bucket-transform table."""
        from pyspark.sql import functions as F

        self._ensure_registered(df.sparkSession, df.schema)
        self.abandon(run_id)  # retry of a crashed run: clean partial dir
        (
            df.repartition(self.n_buckets, F.col(self.bucket_key))
            .withColumn("run_id", F.lit(run_id))
            .write.partitionBy("run_id")
            .bucketBy(self.n_buckets, self.bucket_key)
            .sortBy(self.bucket_key)
            .mode("append")
            .format("parquet")
            .saveAsTable(self.table_name)
        )

    def abandon(self, run_id: str) -> None:
        shutil.rmtree(self.run_dir(run_id), ignore_errors=True)
        if self.bucket_key is not None:
            active = SparkSession.getActiveSession()
            if active is not None and active.catalog.tableExists(self.table_name):
                active.sql(
                    f"ALTER TABLE {self.table_name} DROP IF EXISTS "
                    f"PARTITION (run_id='{run_id}')"
                )

    def replace(self, df: DataFrame, run_id: str) -> None:
        """Rewrite the table as a single snapshot (atomic): the manifest
        flips to [run_id] in one rename; old run dirs become garbage
        (expired snapshots) and are vacuumed afterwards. Reference
        analogue: top-N retention rewrite + VACUUM (HistoryManager.cpp:
        330-363, 391-395); Iceberg analogue: overwrite + expire_snapshots."""
        old_runs = [r for r in self.committed_runs() if r != run_id]
        if self.bucket_key is None:
            df.write.mode("overwrite").parquet(self.run_dir(run_id))
        else:
            self._bucketed_write(df, run_id)
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"runs": [run_id]}, f)
        os.replace(tmp, self.manifest_path)
        for r in old_runs:  # expire old snapshots (post-commit cleanup)
            self.abandon(r)

    def compact(self, spark: SparkSession) -> str | None:
        """Merge all committed snapshots into ONE (Iceberg analogue:
        rewrite_data_files + expire_snapshots; reference analogue:
        VACUUM, HistoryManager.cpp:391-395).

        A run-per-append layout accumulates a directory per ingest — at
        daily 100 TB ingests that is the classic small-file problem:
        scan tasks multiply, bucket files fragment (each append writes
        its own per-bucket files, so a bucketed read opens
        runs x buckets files per bucket). Compaction rewrites the table
        as one snapshot: the source is read as plain parquet (bypassing
        the catalog so the rewrite never inserts into a table it is
        reading), bucketed tables land one file per bucket
        (``_bucketed_write``'s hash-repartition), and the manifest
        flip is the same atomic commit as every other write — a crash
        mid-compaction leaves the old snapshots fully intact."""
        runs = self.committed_runs()
        dirs = [d for d in (self.run_dir(r) for r in runs) if os.path.exists(d)]
        if len(dirs) <= 1:
            return None
        src = spark.read.option("mergeSchema", "true").parquet(*dirs)
        run_id = f"compact-{uuid.uuid4().hex[:8]}"
        self.replace(src, run_id)
        return run_id

    def read(self, spark: SparkSession) -> DataFrame | None:
        """DataFrame over committed runs only; None when table is empty.

        Unbucketed: mergeSchema — schema evolution across snapshots (a
        run appended with an added column reads as the UNION schema,
        older rows null for the new column). Reference analogue:
        in-place store migration, ALTER TABLE history ADD COLUMN
        content_hash (HistoryManager.cpp:70-77).

        Bucketed: a catalog-table scan filtered to committed run_id
        partitions (partition-pruned; uncommitted/crashed runs are
        invisible exactly as before) — the scan reports
        HashPartitioning(bucket_key, n_buckets), so downstream joins and
        aggregations on the key add no Exchange on this side."""
        from pyspark.sql import functions as F

        runs = self.committed_runs()
        dirs = [self.run_dir(r) for r in runs]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            return None
        if self.bucket_key is None:
            return spark.read.option("mergeSchema", "true").parquet(*dirs)
        if not spark.catalog.tableExists(self.table_name):
            # fresh session over durable files: re-register, then recover
            # the run_id partitions from the filesystem
            self._ensure_registered(spark, spark.read.parquet(dirs[0]).schema)
        return (
            spark.table(self.table_name)
            .filter(F.col("run_id").isin(runs))
            .drop("run_id")
        )

    def read_or_empty(self, spark: SparkSession) -> DataFrame:
        df = self.read(spark)
        if df is not None:
            return df
        if self.schema is None:
            raise ValueError(f"empty table {self.path} and no schema declared")
        return spark.createDataFrame([], self.schema)
