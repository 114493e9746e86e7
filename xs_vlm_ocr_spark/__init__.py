"""xs_vlm_ocr_spark — PySpark-native document-understanding / main-content
extraction engine, built from scratch with the capabilities of the
reference `xstongxue/XS-VLM-OCR` (see SURVEY.md) re-expressed Spark-first.

Layout:
    schemas       declared StructTypes (never inferred)
    session       SparkSession builder for local[N] testing
    corpus        deterministic synthetic interleaved-document generator
    extract/      pure-Python single-doc extraction (the golden oracle)
    operators/    Spark DataFrame operators (extraction, dedup, history,
                  skew, text analysis, similarity, multimodal)
    table_io      parquet+manifest checkpointed table (Iceberg stand-in)
    streaming/    Structured Streaming surface (incremental history sink)
"""

__version__ = "0.1.0"
