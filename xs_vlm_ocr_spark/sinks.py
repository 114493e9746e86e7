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


def export_csv(results: DataFrame, out_dir: str, columns: list[str] | None = None) -> None:
    """RFC-4180 CSV with header; embedded quotes/newlines handled by the
    writer (the reference's manual quote-doubling, done right)."""
    df = results.select(*(columns or results.columns))
    # flatten non-atomic columns to JSON so the CSV stays rectangular
    for f in df.schema.fields:
        if f.dataType.typeName() in ("array", "struct", "map"):
            df = df.withColumn(f.name, F.to_json(F.col(f.name)))
    df.write.mode("overwrite").option("header", True).option("escape", '"').csv(out_dir)
