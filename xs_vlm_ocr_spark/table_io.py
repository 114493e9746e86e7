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
    def __init__(self, path: str, schema: T.StructType | None = None) -> None:
        self.path = path
        self.schema = schema
        self.data_dir = os.path.join(path, "data")
        self.manifest_path = os.path.join(path, "manifest.json")

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

    def append(self, df: DataFrame, run_id: str) -> None:
        """Write then commit. Crash before the manifest rewrite leaves the
        table unchanged (the partial run dir is garbage, never read)."""
        df.write.mode("overwrite").parquet(self.run_dir(run_id))
        self._commit(run_id)

    def abandon(self, run_id: str) -> None:
        shutil.rmtree(self.run_dir(run_id), ignore_errors=True)

    def replace(self, df: DataFrame, run_id: str) -> None:
        """Rewrite the table as a single snapshot (atomic): the manifest
        flips to [run_id] in one rename; old run dirs become garbage
        (expired snapshots) and are vacuumed afterwards. Reference
        analogue: top-N retention rewrite + VACUUM (HistoryManager.cpp:
        330-363, 391-395); Iceberg analogue: overwrite + expire_snapshots."""
        old_runs = [r for r in self.committed_runs() if r != run_id]
        df.write.mode("overwrite").parquet(self.run_dir(run_id))
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"runs": [run_id]}, f)
        os.replace(tmp, self.manifest_path)
        for r in old_runs:  # expire old snapshots (post-commit cleanup)
            self.abandon(r)

    def read(self, spark: SparkSession) -> DataFrame | None:
        """DataFrame over committed runs only; None when table is empty.

        mergeSchema: schema evolution across snapshots — a run appended
        with an added column reads as the UNION schema (older rows null
        for the new column) instead of silently dropping it. Reference
        analogue: in-place store migration, ALTER TABLE history ADD
        COLUMN content_hash (HistoryManager.cpp:70-77)."""
        dirs = [self.run_dir(r) for r in self.committed_runs()]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            return None
        return spark.read.option("mergeSchema", "true").parquet(*dirs)

    def read_or_empty(self, spark: SparkSession) -> DataFrame:
        df = self.read(spark)
        if df is not None:
            return df
        if self.schema is None:
            raise ValueError(f"empty table {self.path} and no schema declared")
        return spark.createDataFrame([], self.schema)
