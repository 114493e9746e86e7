"""Export sinks (reference §2.12).

K2 plain-text/markdown export (reference src/ui/MainWindow.cpp:
1900-1914), K3 CSV export with quote handling (reference
MainWindow.cpp:1873-1899 hand-rolls quote doubling; Spark's CSV writer
does RFC-4180 quoting natively), K1 parquet/checkpointed append lives in
table_io. PDF/DOC export (K4) and clipboard (K5) are presentation-layer,
out of scope per SURVEY.md non-goals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_text(results: DataFrame, out_dir: str, text_col: str = "full_text") -> None:
    """One text blob per result row (driver-free, distributed write)."""
    results.select(F.col(text_col).alias("value")).write.mode("overwrite").text(out_dir)


def export_markdown(results: DataFrame, out_dir: str) -> None:
    """# <doc_id> header + full text, markdown-ish (K2)."""
    md = results.select(
        F.concat(
            F.lit("# "), F.col("doc_id"), F.lit("\n\n"), F.col("full_text"), F.lit("\n")
        ).alias("value")
    )
    md.write.mode("overwrite").text(out_dir)


def export_csv(results: DataFrame, out_dir: str, columns: list[str] | None = None,
               bom: bool = False) -> None:
    """RFC-4180 CSV with header; embedded quotes/newlines handled by the
    writer (the reference's manual quote-doubling, done right).

    ``bom=True`` prepends a UTF-8 BOM to each part file (reference
    parity: MainWindow.cpp:1878 writes \\xEF\\xBB\\xBF for Excel). The
    prepend is a driver-side loop over part FILES — O(partitions), not
    O(rows) — after the distributed write."""
    df = results.select(*(columns or results.columns))
    # flatten non-atomic columns to JSON so the CSV stays rectangular
    for f in df.schema.fields:
        if f.dataType.typeName() in ("array", "struct", "map"):
            df = df.withColumn(f.name, F.to_json(F.col(f.name)))
    df.write.mode("overwrite").option("header", True).option("escape", '"').csv(out_dir)
    if bom:
        import glob
        import os

        for part in glob.glob(os.path.join(out_dir, "part-*.csv")):
            with open(part, "rb") as fh:
                data = fh.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                tmp = part + ".bom"
                with open(tmp, "wb") as fh:
                    fh.write(b"\xef\xbb\xbf" + data)
                os.replace(tmp, part)
                # the rewrite invalidates Hadoop's checksum sidecar
                crc = os.path.join(
                    os.path.dirname(part), "." + os.path.basename(part) + ".crc"
                )
                if os.path.exists(crc):
                    os.remove(crc)
