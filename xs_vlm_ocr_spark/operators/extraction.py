"""The extraction map stage — the engine's core operator family.

Spark restatement of the reference's recognize() adapter family
(reference src/core/ModelAdapter.h:35, dispatch src/ui/MainWindow.cpp:
846-882): one Arrow batch in, one batch of span-arrays out, inside a
single ``mapInPandas`` stage wrapping the pure single-doc functions of
``xs_vlm_ocr_spark.extract`` (so golden equality holds by construction
and no state can leak across batch boundaries).

Design points for 100 TB:
  * everything upstream/downstream of the UDF is JVM-side Catalyst
    (validity filter, content hash, full-text merge checks, joins);
  * per-document failure isolation: errors become rows, never thrown
    (reference C4, src/core/OCRPipeline.cpp:84-108);
  * per-partition lineage rows (partition_id, docs_in, docs_out,
    span_count, wall_ms) are emitted in-band as trailing marker rows and
    split off after the single write — no second pass over the data, no
    driver-side accumulation (north-rule metrics table);
  * per-doc processing_time_ms instrumentation (reference
    src/core/OCRResult.h:26); cache hits carry 0 (MainWindow.cpp:1654).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xs_vlm_ocr_spark.extract.pipeline import extract_doc

DEFAULT_MODEL = "main_content_v1"

# Unit separator keeps the hash preimage unambiguous.
_HASH_SEP = "\x1f"


def valid_docs(docs: DataFrame) -> DataFrame:
    """Validity predicate P3 (reference src/ui/MainWindow.cpp:1364-1368):
    non-null doc with at least one span. Invalid rows are routed to an
    error output by the caller, never dropped silently."""
    return docs.filter(
        F.col("doc_id").isNotNull() & F.col("spans").isNotNull() & (F.size("spans") > 0)
    )


def invalid_docs(docs: DataFrame) -> DataFrame:
    return docs.filter(
        F.col("doc_id").isNull() | F.col("spans").isNull() | (F.size("spans") <= 0)
    )


def with_content_hash(docs: DataFrame, model_name: str = DEFAULT_MODEL) -> DataFrame:
    """Deterministic md5 over canonicalized (doc, strategy) — JVM-side,
    codegen'd. Reference: HistoryManager::computeContentHash
    (src/managers/HistoryManager.cpp:433-464)."""
    return docs.withColumn(
        "content_hash",
        F.md5(
            F.concat_ws(
                _HASH_SEP, F.col("doc_id"), F.lit(model_name), F.to_json(F.col("spans"))
            )
        ),
    )


def extract_spans(docs: DataFrame, model_name: str = DEFAULT_MODEL,
                  timeout_ms: int | None = None) -> DataFrame:
    """docs(doc_id, spans[, content_hash]) -> EXTRACTION_OUTPUT rows.

    Output carries one row per doc plus one trailing lineage marker row
    per partition (doc_id NULL); split with ``split_extraction_output``.

    ``timeout_ms``: per-doc wall budget (reference C5 — the adapters'
    request timeout, e.g. QwenAdapter's network timeout). A doc whose
    extraction exceeds the budget is routed as an error row
    (success=false, error 'timeout: ...'), exactly like the reference
    discarding a late response — never thrown, never silently dropped.
    Spark analogue of the hard-kill side: task-level speculative
    execution / spark.task.reaper on a real cluster; in-process the
    extractor is a pure function so a soft budget suffices.

    Serde strategy (measured ~40% of stage time otherwise): the
    array-of-struct spans column crosses the Arrow boundary as four
    parallel primitive arrays in both directions — primitive-list Arrow
    conversion is far cheaper than per-span python dicts — and the
    output struct array is rebuilt JVM-side with arrays_zip/transform
    (the dense `order` field IS the array index, by construction of
    extract_doc's output).
    """
    if "content_hash" not in docs.columns:
        docs = with_content_hash(docs, model_name)
    src = docs.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
        F.col("spans.media_ref").alias("_refs"),
        F.col("spans.offset").alias("_offs"),
        "content_hash",
    )

    # engine dispatch (reference MainWindow.cpp:846-882): strategy name ->
    # registered single-doc extractor; unknown names use the default.
    # When the strategy exposes an `arrays_impl` (parallel-primitive-array
    # calling convention — the canonical extract_doc does), the hot loop
    # never builds a per-span dict in either direction; dict-only custom
    # strategies fall back to the adapter path.
    from xs_vlm_ocr_spark.strategies import REGISTRY

    extract_fn = REGISTRY.get(model_name, extract_doc)
    arrays_fn = getattr(extract_fn, "arrays_impl", None)

    raw_ddl = (
        "doc_id string, success boolean, error_message string, "
        "o_kinds array<string>, o_texts array<string>, o_refs array<string>, "
        "model_name string, content_hash string, "
        "processing_time_ms long, "
        "lineage struct<partition_id:int,docs_in:long,docs_out:long,span_count:long,wall_ms:long>"
    )
    cols = ["doc_id", "success", "error_message", "o_kinds", "o_texts", "o_refs",
            "model_name", "content_hash", "processing_time_ms", "lineage"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        t_start = time.monotonic()
        docs_in = docs_out = span_count = 0
        for pdf in batches:
            # columnar accumulators: pd.DataFrame(dict-of-lists) skips the
            # row-tuple transpose pandas does for a list-of-rows
            c_ok: list = []     # success
            c_err: list = []    # error_message
            c_k: list = []; c_t: list = []; c_r: list = []  # noqa: E702
            c_ms: list = []
            for doc_id, kinds, texts, refs, offs in zip(
                pdf["doc_id"], pdf["_kinds"], pdf["_texts"], pdf["_refs"],
                pdf["_offs"],
            ):
                docs_in += 1
                t0 = time.monotonic_ns()
                try:
                    if arrays_fn is not None:
                        out_k, out_t, out_r = arrays_fn(kinds, texts, refs, offs)
                    else:
                        out = extract_fn([
                            {"kind": k, "text": t, "media_ref": r, "offset": int(o)}
                            for k, t, r, o in zip(kinds, texts, refs, offs)
                        ])
                        out_k = [s["kind"] for s in out]
                        out_t = [s["text"] for s in out]
                        out_r = [s["media_ref"] for s in out]
                    elapsed = (time.monotonic_ns() - t0) // 1_000_000
                    if timeout_ms is not None and elapsed > timeout_ms:
                        c_ok.append(False)
                        c_err.append(f"timeout: {elapsed} ms > budget {timeout_ms} ms")
                        c_k.append([]); c_t.append([]); c_r.append([])  # noqa: E702
                        c_ms.append(elapsed)
                        continue
                    docs_out += 1
                    span_count += len(out_k)
                    c_ok.append(True); c_err.append("")  # noqa: E702
                    c_k.append(out_k); c_t.append(out_t); c_r.append(out_r)  # noqa: E702
                    c_ms.append(elapsed)
                except Exception as exc:  # failure isolation: error rows, never raise
                    elapsed = (time.monotonic_ns() - t0) // 1_000_000
                    c_ok.append(False)
                    c_err.append(f"{type(exc).__name__}: {exc}"[:500])
                    c_k.append([]); c_t.append([]); c_r.append([])  # noqa: E702
                    c_ms.append(elapsed)
            if c_ok:
                n = len(c_ok)
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"].to_numpy(),  # raw array: no index alignment
                    "success": c_ok, "error_message": c_err,
                    "o_kinds": c_k, "o_texts": c_t, "o_refs": c_r,
                    "model_name": [model_name] * n,
                    "content_hash": pdf["content_hash"].to_numpy(),
                    "processing_time_ms": c_ms, "lineage": [None] * n,
                })
        wall_ms = int((time.monotonic() - t_start) * 1000)
        lineage = {"partition_id": pid, "docs_in": docs_in, "docs_out": docs_out,
                   "span_count": span_count, "wall_ms": wall_ms}
        yield pd.DataFrame(
            [(None, None, None, None, None, None, None, None, None, lineage)],
            columns=cols,
        )

    raw = src.mapInPandas(run, schema=raw_ddl)
    spans_out = F.transform(
        F.arrays_zip("o_kinds", "o_texts", "o_refs"),
        lambda s, i: F.struct(
            s["o_kinds"].alias("kind"),
            s["o_texts"].alias("text"),
            s["o_refs"].alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    )
    # full-text merge JVM-side (same rule as extract.pipeline
    # merge_full_text; cross-implementation parity pinned by
    # tests/test_end_to_end.py): the document's text bytes cross the
    # Arrow boundary once as o_texts instead of twice — at 32 workers
    # per socket the Arrow transport is the measured bandwidth
    # bottleneck (BENCH/BASELINE.md noop control). NULL arrays (the
    # lineage marker row) propagate to NULL; error rows ([] arrays)
    # join to "" — both exactly the python stage's old output.
    full_text = F.array_join(
        F.transform(
            F.filter(
                F.arrays_zip("o_kinds", "o_texts"),
                lambda s: (s["o_kinds"] == F.lit("text")) & (s["o_texts"] != F.lit("")),
            ),
            lambda s: s["o_texts"],
        ),
        "\n",
    )
    return raw.select(
        "doc_id", "success", "error_message",
        F.when(F.col("doc_id").isNotNull(), spans_out).alias("spans_out"),
        full_text.alias("full_text"),
        "model_name", "content_hash", "processing_time_ms", "lineage",
    )


def split_extraction_output(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(results, lineage) from the combined extraction output."""
    results = combined.filter(F.col("doc_id").isNotNull()).drop("lineage")
    lineage = combined.filter(F.col("doc_id").isNull()).select("lineage.*")
    return results, lineage
