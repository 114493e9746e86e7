"""Analytic Arrow-transport accounting: ship-all vs Arrow-bypass.

Computes, from the data itself (deterministic, no timing), how many
string/scalar bytes cross the JVM<->Python Arrow boundary per design for
a given docs DataFrame:

  ship-all IN   doc_id + content_hash + per-span kind/text/ref strings
                + 4B offset
  ship-all OUT  doc_id + content_hash + model_name + flags + per-out-span
                kind/text/ref (ALL extracted text crosses back)
  bypass IN     per-span 4B code + 4B offset + 1B blank flag + text for
                html/pdf spans ONLY
  bypass OUT    per-slot 4B src + text for PYTHON-PRODUCED slots only
                (html segments, pdf paragraphs) + timing/err fields

Usage: python tools/transport_bytes.py [n_corpus_docs]
Prints one JSON line per workload (synthetic corpus + flagship
interleave at sf0.1); paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def account(docs, model_name="main_content_v1"):
    from xs_vlm_ocr_spark.operators.extraction import (
        extract_spans, norm_col, valid_docs, with_content_hash,
    )

    hashed = with_content_hash(valid_docs(docs), model_name)
    sp = F.col("spans")
    o = lambda c: F.coalesce(F.octet_length(c), F.lit(0))  # noqa: E731

    per_in = hashed.select(
        o(F.col("doc_id")).alias("id_b"),
        F.lit(32).alias("hash_b"),
        F.aggregate(sp, F.lit(0).cast("long"),
                    lambda a, s: a + o(s["kind"]) + o(s["text"]) + o(s["media_ref"]) + 4
                    ).alias("shipall_span_b"),
        F.aggregate(sp, F.lit(0).cast("long"),
                    lambda a, s: a + 9 + F.when(
                        s["kind"].isin("html", "pdf_line"), o(s["text"])
                    ).otherwise(0)).alias("bypass_span_b"),
        F.aggregate(sp, F.lit(0).cast("long"),
                    lambda a, s: a + F.when(
                        s["kind"] == F.lit("text"), o(norm_col(F.coalesce(s["text"], F.lit(""))))
                    ).otherwise(0)).alias("norm_text_b"),
        F.size(sp).alias("n_spans"),
    ).agg(
        F.sum(F.col("id_b") + F.col("hash_b") + F.col("shipall_span_b")).alias("shipall_in"),
        F.sum("bypass_span_b").alias("bypass_in"),
        F.sum("norm_text_b").alias("norm_out_b"),
        F.sum(F.col("id_b") + F.col("hash_b")).alias("row_ident_b"),
        F.count(F.lit(1)).alias("n_docs"),
    ).first()

    out = extract_spans(hashed, model_name)
    per_out = out.select(
        F.aggregate(F.col("spans_out"), F.lit(0).cast("long"),
                    lambda a, s: a + o(s["kind"]) + o(s["text"]) + o(s["media_ref"])
                    ).alias("all_out_b"),
        F.size("spans_out").alias("n_out"),
    ).agg(
        F.sum("all_out_b").alias("all_out_b"), F.sum("n_out").alias("n_out")
    ).first()

    n = per_in["n_docs"]
    model_b = len(model_name)
    shipall_out = (per_out["all_out_b"] + per_in["row_ident_b"]
                   + n * (model_b + 1 + 8))          # success flag + ms
    # python-produced slot text = all out text-ish bytes minus the
    # passthrough normed text (media slots contribute ref bytes which are
    # shipall-only; subtracting norm_out removes the text-span texts)
    bypass_out = (per_out["all_out_b"]
                  - per_in["norm_out_b"]                     # text spans stay JVM
                  # shipall-only per-slot kind strings (~4-5B) and media
                  # refs remain counted in all_out_b for shipall; for the
                  # bypass they do not cross: subtract them
                  + per_out["n_out"] * 4                     # src ints
                  + n * (8 + 8))                             # ms + cum_wall
    # remove kind+ref bytes from the bypass-out tally: recompute exactly
    kindref = out.select(
        F.aggregate(F.col("spans_out"), F.lit(0).cast("long"),
                    lambda a, s: a + o(s["kind"]) + o(s["media_ref"])).alias("kr")
    ).agg(F.sum("kr")).first()[0]
    bypass_out -= kindref

    return {
        "n_docs": n,
        "shipall_in_bytes": int(per_in["shipall_in"]),
        "bypass_in_bytes": int(per_in["bypass_in"]),
        "shipall_out_bytes": int(shipall_out),
        "bypass_out_bytes": int(bypass_out),
        "in_reduction": round(1 - per_in["bypass_in"] / per_in["shipall_in"], 3),
        "out_reduction": round(1 - bypass_out / shipall_out, 3),
        "total_reduction": round(
            1 - (per_in["bypass_in"] + bypass_out)
            / (per_in["shipall_in"] + shipall_out), 3),
    }


def main() -> None:
    from xs_vlm_ocr_spark.corpus import gen_docs_df
    from xs_vlm_ocr_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("transport_bytes", cores=8, shuffle_partitions=8)

    from xs_vlm_ocr_spark.corpus import gen_interleave_docs_df

    corpus = gen_docs_df(spark, n_docs)
    print(json.dumps({"workload": f"synthetic corpus ({n_docs} docs)",
                      **account(corpus)}))
    il = gen_interleave_docs_df(spark, n_docs)
    print(json.dumps({"workload": f"synthetic interleave ({n_docs} docs)",
                      **account(il)}))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    sf = "/root/testdata/sf0.1"
    if os.path.isdir(sf):
        fdocs = em._interleave_documents(em._doc_table(spark, sf, "documents"))
        print(json.dumps({"workload": "flagship interleave (sf0.1)",
                          **account(fdocs)}))


if __name__ == "__main__":
    main()
