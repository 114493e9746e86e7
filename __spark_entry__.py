"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (SURVEY.md §3.1
restated) on sf0.001. ``queries()``/``oracle_sql()`` cover SURVEY.md §2
(history/metrics surface, dedup joins, text analysis, similarity
search) against the driver's parquet tables — every registered query
has a DuckDB oracle: SQL-portable ops directly, hash-family ops via
md5-derived portable twins, and the extraction flagship via a committed
pure-Python fixture (tools/make_flagship_fixture.py; regenerated ONLY
by that explicit tool run — never silently inside the contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The oracle SQL interpolates the SAME whitespace/token regexes the Spark
# operators compile (Java \s and RE2 \s disagree on \x0B — pinning one
# explicit class in both engines makes tokenization parity structural).
from xs_vlm_ocr_spark.operators.text_analysis import BPE_RE, WS_CHARS, WS_RE


def _doc_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------------------ flagship

def _interleave_documents(docs: DataFrame) -> DataFrame:
    """Deterministically wrap the driver's flat `documents` table into the
    engine's interleaved span format (html span with boilerplate + media
    span + plain text span) — pure column expressions, JVM-side."""
    html_text = F.concat(
        F.lit(
            '<nav><ul><li><a href="#">home</a></li><li><a href="#">about</a></li>'
            '<li><a href="#">contact</a></li></ul></nav><article><p>'
        ),
        F.col("text"),
        F.lit("</p></article><footer><p>footer text</p></footer>"),
    )
    doc_id = F.col("doc_id").cast("string")
    off1 = (F.octet_length(html_text) + F.lit(1)).cast("int")
    off2 = (off1 + F.octet_length(F.concat(F.lit("img://"), doc_id, F.lit("/0"))) + F.lit(1)).cast("int")
    spans = F.array(
        F.struct(
            F.lit("html").alias("kind"), html_text.alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"), F.lit("").alias("text"),
            F.concat(F.lit("img://"), doc_id, F.lit("/0")).alias("media_ref"),
            off1.alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"), F.col("text").alias("text"),
            F.lit("").alias("media_ref"), off2.alias("offset"),
        ),
    )
    return docs.select(doc_id.alias("doc_id"), spans.alias("spans"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs -> validity filter -> content hash ->
    length-range repartition -> vectorized extraction -> exploded spans."""
    from xs_vlm_ocr_spark.operators.extraction import (
        extract_spans,
        split_extraction_output,
        valid_docs,
        with_content_hash,
    )
    from xs_vlm_ocr_spark.operators.skew import repartition_by_doc_length

    docs = _interleave_documents(_doc_table(spark, "/root/testdata/sf0.001", "documents"))
    jobs = repartition_by_doc_length(with_content_hash(valid_docs(docs)), 16)
    results, _lineage = split_extraction_output(extract_spans(jobs))
    return results.select(
        "doc_id", "content_hash", F.explode("spans_out").alias("span")
    ).select(
        "doc_id", "content_hash",
        F.col("span.kind").alias("kind"), F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"), F.col("span.order").alias("order"),
    )


# ------------------------------------------------------------------- queries

def _q_history_filtered_count(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import filtered_count

    ev = _doc_table(spark, sf_dir, "events")
    return filtered_count(
        ev, ts_col="ts", start="2024-01-10 00:00:00", end="2024-01-20 23:59:59",
        keyword="click", keyword_cols=("event_type", "props"),
    )


def _q_history_keyword_search(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import filter_history

    ev = _doc_table(spark, sf_dir, "events")
    return filter_history(
        ev, ts_col="ts", start="2024-01-05 00:00:00", end=None,
        keyword="9", keyword_cols=("event_type", "props"),
    ).select("event_id", "event_type", "props")


def _q_history_page(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import paginate

    ev = _doc_table(spark, sf_dir, "events")
    return paginate(ev, "ts", "event_id", page=2, page_size=20).select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "event_type"
    )


def _q_history_topn_retention(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import retention_topn

    ev = _doc_table(spark, sf_dir, "events")
    return retention_topn(ev, 100, "ts", "event_id").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )


def _q_history_latest_per_key(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import latest_per_key

    ev = _doc_table(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id", "event_type"], "ts", "event_id").select(
        "user_id", "event_type", F.col("event_id").alias("latest_event_id")
    )


def _q_history_point_lookup(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import point_lookup

    ev = _doc_table(spark, sf_dir, "events")
    return point_lookup(ev, "event_id", 4242).select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "user_id", "event_type", "value"
    )


def _q_doc_preview(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.history import preview_projection

    docs = _doc_table(spark, sf_dir, "documents")
    return preview_projection(docs, "text").select("doc_id", "preview")


def _q_config_inheritance_join(spark, sf_dir):
    # J1: left join + coalesce param inheritance (broadcast small dim)
    cust = _doc_table(spark, sf_dir, "customer")
    nation = _doc_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("")), F.col("n_name")).alias(
                "segment_or_nation"
            ),
            F.col("n_name").alias("nation_name"),
        )
    )


def _q_batch_status_counts(spark, sf_dir):
    ev = _doc_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def _q_char_stats(spark, sf_dir):
    docs = _doc_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _q_tpch_q1(spark, sf_dir):
    li = _doc_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731 — exact money math
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 23:59:59")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_dedup_exact_groups(spark, sf_dir):
    docs = _doc_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.md5(F.substring("text", 1, 24)))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_dupes"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dupes") > 1)
    )


def _q_dedup_exact_keep_first(spark, sf_dir):
    # the REAL exact_dedup operator (keep-first winners, full rows) —
    # registered so the plan audit pins its scale shape: map-side
    # partial_min winner agg + composite-key semi-join, no hot-hash
    # window (round-4 verdict What's-wrong #2)
    from xs_vlm_ocr_spark.operators.dedup import exact_dedup

    docs = _doc_table(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text")


def _q_dedup_cache_probe(spark, sf_dir):
    # D1/J2: the memoization / resume anti-join, via the real operator
    from xs_vlm_ocr_spark.operators.dedup import filter_uncached

    docs = _doc_table(spark, sf_dir, "documents")
    jobs = docs.withColumn("content_hash", F.md5("text"))
    committed = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("content_hash"), F.lit(True).alias("success"))
    )
    return filter_uncached(jobs, committed).select("doc_id")


def _q_token_count(spark, sf_dir):
    """Both tokenizer regimes in one projection: the pinned-whitespace
    word count and the BPE-ish regex piece count (the two budgets a
    training-data pipeline sizes corpora by)."""
    from xs_vlm_ocr_spark.operators.text_analysis import (
        bpe_ish_token_count,
        token_count,
    )

    docs = _doc_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
    )


def _q_quality_score(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.text_analysis import quality_score, token_count

    docs = _doc_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


def _q_events_hourly_rollup(spark, sf_dir):
    ev = _doc_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))


def _q_knn_topk_cosine(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.similarity import cosine_topk

    emb = _doc_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10)


def _check_flagship_fixture(sf_dir):
    """Tamper-evident freshness check — NEVER regenerates. The committed
    fixture is the oracle's expectation; re-deriving it inside the
    contract run would make the check verify plumbing only (a semantic
    regression in extract/ would regenerate a matching fixture and pass).
    Regeneration happens ONLY via an explicit
    `python tools/make_flagship_fixture.py` run; here we just warn
    loudly on stderr when the sidecar says the driver's input changed,
    so a genuine oracle mismatch downstream is diagnosable as staleness
    rather than an engine bug. Sensitivity is proven by
    tests/test_flagship_fixture_guard.py (a perturbed extractor makes
    the compare fail)."""
    import hashlib
    import os
    import sys as _sys

    if os.path.basename(sf_dir.rstrip("/")) != "sf0.01":
        return
    here = os.path.dirname(os.path.abspath(__file__))
    fixture = os.path.join(here, "fixtures", "flagship_expected_sf0.01.parquet")
    sidecar = fixture + ".input_md5"
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        with open(src, "rb") as f:
            cur = hashlib.md5(f.read()).hexdigest()
        recorded = ""
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                # labeled field (md5=<hex>); tolerate the legacy
                # positional "<path> <md5> ..." layout
                toks = f.read().split()
                labeled = [t[4:] for t in toks if t.startswith("md5=")]
                recorded = labeled[0] if labeled else (toks[1] if len(toks) > 1 else "")
        if not os.path.exists(fixture) or cur != recorded:
            print(
                f"[extract_flagship] WARNING: oracle fixture is STALE or missing "
                f"(input md5 {cur} != recorded {recorded or '<none>'}). The oracle "
                f"compare will fail until you run: python tools/"
                f"make_flagship_fixture.py {sf_dir} {fixture}",
                file=_sys.stderr, flush=True,
            )
    except Exception as exc:  # diagnostics only — never block the query
        print(f"[extract_flagship] fixture freshness check errored: {exc}",
              file=_sys.stderr, flush=True)


def _q_extract_flagship(spark, sf_dir):
    """Extraction over interleaved docs. Value-checked against a parquet
    fixture materialized from the PURE-PYTHON single-doc extractor (the
    independent implementation the golden tests trust) over the same
    deterministic interleave — see tools/make_flagship_fixture.py. The
    fixture is COMMITTED and only regenerated by that explicit tool run;
    _check_flagship_fixture warns (stderr) when the recorded input md5
    no longer matches the driver's sf0.01 table."""
    _check_flagship_fixture(sf_dir)
    from xs_vlm_ocr_spark.operators.extraction import (
        extract_spans,
        split_extraction_output,
        valid_docs,
        with_content_hash,
    )

    docs = _interleave_documents(_doc_table(spark, sf_dir, "documents"))
    results, _ = split_extraction_output(extract_spans(with_content_hash(valid_docs(docs))))
    return results.select(
        "doc_id", F.explode("spans_out").alias("span")
    ).select("doc_id", "span.kind", "span.text", "span.media_ref", "span.order")


def _q_knn_lsh(spark, sf_dir):
    """Approximate ANN via random-hyperplane LSH buckets, oracle-checked:
    the DuckDB oracle embeds the SAME seeded hyperplanes as decimal
    literals (both engines parse them to identical doubles), recomputes
    the sign-bit buckets, and reranks within buckets — recall vs exact
    is additionally asserted in tests/test_similarity.py."""
    from xs_vlm_ocr_spark.operators.similarity import lsh_cosine_topk

    emb = _doc_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 3), dim=64, k=10, n_planes=4)


def _knn_lsh_oracle_sql() -> str:
    """Oracle for _q_knn_lsh, generated with the same hyperplane values."""
    from xs_vlm_ocr_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 4, seed=42)
    rows = ",\n              ".join(
        f"({j}, [{', '.join(repr(x) for x in p)}])" for j, p in enumerate(planes)
    )
    return f"""
            WITH pl(j, p) AS (VALUES
              {rows}
            ),
            b AS (
              SELECT e.vec_id, e.embedding,
                     sum(CASE WHEN list_sum(list_transform(
                                list_zip(e.embedding, pl.p),
                                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                              >= 0
                         THEN 1 << pl.j ELSE 0 END) AS bucket
              FROM embeddings e CROSS JOIN pl
              GROUP BY e.vec_id, e.embedding
            ),
            q AS (SELECT vec_id qid, embedding qe, bucket FROM b WHERE vec_id < 3),
            c AS (SELECT vec_id nid, embedding ne, bucket FROM b),
            pairs AS (
              SELECT qid, nid,
                list_sum(list_transform(list_zip(qe, ne),
                         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
                sqrt(list_sum(list_transform(qe,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
                sqrt(list_sum(list_transform(ne,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nn
              FROM q JOIN c USING (bucket) WHERE qid <> nid
            )
            SELECT qid AS query_id, nid AS neighbor_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY dot/(nq*nn) DESC, nid) AS knn_rank
            FROM pairs QUALIFY knn_rank <= 10
    """




def _lang_id_oracle_sql() -> str:
    """Oracle for _q_lang_id, generated from the SAME marker lists and
    pinned whitespace class as operators.text_analysis.lang_id — the
    word-boundary regex is identical in both engines by construction."""
    from xs_vlm_ocr_spark.operators.text_analysis import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hit_cols = ",\n                       ".join(
        "("
        + " + ".join(
            f"len(regexp_extract_all(lower(text), "
            f"'(^|[{WS_CHARS}]){w}([{WS_CHARS}]|$)'))"
            for w in LANG_MARKERS[lang]
        )
        + f") AS h_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    cases = "\n                        ".join(
        f"WHEN h_{lg} = {best} THEN '{lg}'" for lg in langs[:-1]
    )
    return f"""
            WITH hits AS (
                SELECT doc_id,
                       {hit_cols}
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN {best} = 0 THEN 'und'
                        {cases}
                        ELSE '{langs[-1]}' END AS lang_guess
            FROM hits
    """


def _q_ngram_jaccard(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.text_dedup import ngram_jaccard_pairs

    docs = _doc_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, text_col="text", n=3, threshold=0.5)


def _q_embedding_near_dup(spark, sf_dir):
    """BOTH eps-grid cosine near-dup regimes in one union, tagged by
    `regime`. t04 is the loose threshold over the raw embeddings. t09
    is the tight threshold: the driver's isotropic embeddings have no
    natural 0.9-cosine pairs, so the t09 input plants one exact clone
    per vector (vec_id + 100000) — both engines build the same union,
    and the expected output is exactly the planted (v, v+100000) pairs,
    value-checking candidate generation AND the exact verify at the
    tight threshold. The pruning the tight regime enables is asserted
    on clustered data in
    tests/test_text_dedup.py::test_grid_prunes_clustered_data_at_tight_threshold
    (isotropic high-dim input degrades the grid to a hash-partitioned
    all-pairs equi-join — see the operator docstring)."""
    from xs_vlm_ocr_spark.operators.text_dedup import embedding_near_dup_pairs

    emb = _doc_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    loose = embedding_near_dup_pairs(emb, threshold=0.4, dim=64).select(
        "a", "b", F.lit("t04").alias("regime")
    )
    planted = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    tight = embedding_near_dup_pairs(
        emb.unionByName(planted), threshold=0.9, dim=64
    ).select("a", "b", F.lit("t09").alias("regime"))
    return loose.unionByName(tight)


def _q_lang_id(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.text_analysis import lang_id

    docs = _doc_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


def _q_fingerprint_dedup(spark, sf_dir):
    """Fingerprint dedup groups, oracle-checked via the md5-derived
    portable fingerprint (same dedup semantics as the xxhash64 default,
    which DuckDB can't replicate; the xxhash64 path is pinned by
    tests/test_text_analysis determinism tests)."""
    from xs_vlm_ocr_spark.operators.text_analysis import fingerprint64_md5

    docs = _doc_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", fingerprint64_md5(F.col("text")))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_doc_id"))
    )


def _q_minhash_lsh(spark, sf_dir):
    """Banded MinHash LSH, oracle-checked end-to-end via the portable
    md5-derived hash family (minhash_lsh_pairs_portable). The
    vectorized pandas-UDF path (xxhash/blake2b, num_perm=64) is the
    high-num_perm default, pinned by planted-dup + determinism tests."""
    from xs_vlm_ocr_spark.operators.text_dedup import minhash_lsh_pairs_portable

    docs = _doc_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs_portable(docs, num_perm=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )


def _q_neardup_clusters(spark, sf_dir):
    """Pairs -> CLUSTERS: the step an actual dedup pass needs after any
    pair emitter. Connected components of the banded-MinHash near-dup
    pair graph via alternating large-star/small-star (Kiveris et al.,
    SoCC 2014 — O(log n) rounds of plain groupBy/join, no driver-side
    union-find), then every document assigned its cluster (minimum
    member doc_id; docs in no pair are their own singleton cluster) and
    is_canonical marks the one row per cluster a dedup keeps. Oracle:
    recursive-CTE transitive closure over the identical pair set."""
    from xs_vlm_ocr_spark.operators.components import assign_clusters
    from xs_vlm_ocr_spark.operators.text_dedup import minhash_lsh_pairs_portable

    docs = _doc_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_portable(docs, num_perm=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )
    return assign_clusters(docs.select("doc_id"), pairs).select(
        "doc_id", "cluster_id", "is_canonical"
    )


def _q_neardup_clusters_incremental(spark, sf_dir):
    """The INCREMENTAL cluster-maintenance path, value-checked end to
    end: the corpus is split into an 'old' ingest (doc_id % 5 != 0) and
    a 'new' increment; the old batch's pairs are clustered first, then
    incremental_components advances that assignment with ONLY the pairs
    touching the increment (star compression — the old pair set is
    never re-read). The oracle is the SAME transitive closure over the
    full pair set as `neardup_clusters`: incremental == full recompute
    is the correctness claim."""
    from xs_vlm_ocr_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from xs_vlm_ocr_spark.operators.text_dedup import minhash_lsh_pairs_portable

    docs = _doc_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_portable(docs, num_perm=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )
    is_new = lambda c: F.col(c) % 5 == 0  # noqa: E731
    old_pairs = pairs.filter(~is_new("a") & ~is_new("b"))
    new_pairs = pairs.filter(is_new("a") | is_new("b"))
    prev = connected_components(old_pairs, "a", "b")
    comp = incremental_components(prev, new_pairs).withColumnRenamed(
        "node", "doc_id"
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("component"), F.col("doc_id"))
        )
        .drop("component")
        .withColumn(
            "is_canonical",
            (F.col("cluster_id") == F.col("doc_id")).cast("int"),
        )
    )


def _q_ngram_contamination(spark, sf_dir):
    """Train/test decontamination (GPT-3 appendix-C discipline): train
    docs (doc_id % 5 != 0) sharing any distinct word 3-gram with the
    held-out set (doc_id % 5 = 0), with the distinct-overlap count. The
    test gram set is broadcast — the 100 TB train side never shuffles
    its grams."""
    from xs_vlm_ocr_spark.operators.text_dedup import ngram_contamination

    docs = _doc_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    return ngram_contamination(train, test, n=3, min_hits=1)


def _q_contamination_spans(spark, sf_dir):
    """Span-level decontamination (the GPT-3 appendix-C surgery: remove
    the contaminated WINDOW, not the whole doc): merged token spans of
    every train region sharing a word 3-gram with the held-out set.
    Oracle: gaps-and-islands over the hit positions."""
    from xs_vlm_ocr_spark.operators.text_dedup import contamination_spans

    docs = _doc_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    return contamination_spans(train, test, n=3)


def _q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals per document (word-2-gram
    duplicate fraction + most-frequent-gram share; Rae et al. 2021
    A1.1). Per-doc computation with ZERO corpus shuffle: array counts +
    a run-length fold over the per-doc sorted gram array, one
    projection, all JVM."""
    from xs_vlm_ocr_spark.operators.text_analysis import repetition_signals

    docs = _doc_table(spark, sf_dir, "documents")
    return repetition_signals(docs, n=2)


def _q_deduped_kept_corpus(spark, sf_dir):
    """The MATERIALIZED corpus-cleaning decision, end to end: near-dup
    clusters (banded MinHash -> connected components) mark non-canonical
    docs `duplicate`; Gopher-style quality thresholds mark low-quality
    docs `quality`; GPT-3 appendix-C span surgery cuts contaminated
    token windows from surviving text (was_trimmed=1). This is the SAME
    `decide_corpus` projection `ExtractionJob.write_deduped` commits on
    the deployment surface (operators/dedup.py — shared code, the
    deployed decision and the oracle-checked one cannot fork). Oracle:
    the composed SQL of each input's already-verified oracle plus an
    unnest-based token-window cut."""
    from xs_vlm_ocr_spark.operators.components import assign_clusters
    from xs_vlm_ocr_spark.operators.dedup import decide_corpus
    from xs_vlm_ocr_spark.operators.text_analysis import (
        quality_score,
        repetition_signals,
    )
    from xs_vlm_ocr_spark.operators.text_dedup import (
        contamination_spans,
        minhash_lsh_pairs_portable,
    )

    docs = _doc_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_portable(docs, num_perm=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )
    clusters = assign_clusters(docs.select("doc_id"), pairs)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    spans = contamination_spans(train, test, n=3)
    sig = repetition_signals(docs, n=2).join(
        docs.select(
            "doc_id", quality_score(F.col("text")).alias("quality_score")
        ),
        "doc_id",
    )
    decided = decide_corpus(
        docs.select("doc_id", "text"),
        text_col="text",
        clusters=clusters,
        spans=spans,
        signals=sig,
        min_quality=0.9,
        max_top_gram_frac=0.08,
    )
    return decided.select(
        "doc_id",
        F.coalesce("reason", F.lit("kept")).alias("reason"),
        F.col("was_trimmed").cast("int").alias("was_trimmed"),
        "text",
    )


def _q_incremental_minhash(spark, sf_dir):
    """Incremental near-dup: new batch (doc_id % 5 = 0) probed against a
    committed minhash_band_index of the rest of the corpus. Signatures
    are computed once per side, candidates come from a single-key bucket
    equi-join against the index — committed text is never re-read at
    ingest time (the 100 TB ingestion primitive)."""
    from xs_vlm_ocr_spark.operators.text_dedup import (
        minhash_band_index,
        minhash_probe_index,
    )

    docs = _doc_table(spark, sf_dir, "documents")
    committed = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = minhash_band_index(committed, num_perm=16, bands=4)
    return minhash_probe_index(new, idx, num_perm=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )


def _q_minhash_index_maintenance(spark, sf_dir):
    """Index MAINTENANCE: the committed index of batch A plus band rows
    computed for ONLY the new batch B (minhash_index_append). The md5
    family makes maintenance exact — append(index(A), B) is row-for-row
    index(A ∪ B) — so the oracle simply builds the full index over all
    documents in SQL. (The bit-equality itself is additionally pinned by
    tests/test_text_dedup.py::test_minhash_index_append_equals_rebuild.)"""
    from xs_vlm_ocr_spark.operators.text_dedup import (
        minhash_band_index,
        minhash_index_append,
    )

    docs = _doc_table(spark, sf_dir, "documents")
    committed = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = minhash_band_index(committed, num_perm=16, bands=4, persist=False)
    return minhash_index_append(idx, new, num_perm=16, bands=4).select(
        "doc_id", "band", "bucket"
    )


def _q_simhash_near(spark, sf_dir):
    """SimHash near-pairs, oracle-checked end-to-end via the portable
    md5-derived 60-bit hash (simhash_near_pairs_portable); the
    vectorized numpy-UDF default is pinned by planted-dup tests."""
    from xs_vlm_ocr_spark.operators.text_dedup import simhash_near_pairs_portable

    docs = _doc_table(spark, sf_dir, "documents")
    return simhash_near_pairs_portable(docs, max_hamming=3, bands=4)


def _q_media_decode(spark, sf_dir):
    """Multimodal decode plumbing with a sha256-derived deterministic
    fake decoder — oracle-checkable because DuckDB has sha256 too."""
    from xs_vlm_ocr_spark.operators.multimodal import decode_media_batch

    docs = _doc_table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return decode_media_batch(media, fake=True).select(
        "media_ref", "width", "height", "mode"
    )


def _q_prompt_templates(spark, sf_dir):
    """Two-level prompt-template dictionary grouped in UI tab order
    (reference ConfigManager.h:23-32, MainWindow.cpp:2470-2493)."""
    from xs_vlm_ocr_spark import strategies as S

    return S.templates_by_type(S.prompt_templates_df(spark, S.load_config()))


def _q_strategy_inheritance(spark, sf_dir):
    """J1 provider->model param inheritance on a fixed config dim."""
    from xs_vlm_ocr_spark import strategies as S

    config = {
        "providers": [
            {"id": "p1", "name": "ProvOne", "api_host": "https://p1", "api_key": "K1"},
            {"id": "p2", "name": "ProvTwo", "api_host": "https://p2", "api_key": ""},
        ],
        "models": [
            {"id": "m1", "display_name": "M1", "type": "online", "engine": "e1",
             "provider": "p1", "params": {"api_key": "OWN"}, "enabled": True},
            {"id": "m2", "display_name": "M2", "type": "online", "engine": "e2",
             "provider": "p1", "params": {}, "enabled": False},
            {"id": "m3", "display_name": "M3", "type": "online", "engine": "e3",
             "provider": "p2", "params": {}, "enabled": True},
        ],
    }
    models = S.strategies_df(spark, config)
    provs = S.providers_df(spark, config)
    out = S.inherit_provider_params(models, provs)
    return out.select(
        "id",
        F.element_at("params", "api_host").alias("api_host"),
        F.element_at("params", "api_key").alias("api_key"),
        "enabled",
    )




def _q_asof_join(spark, sf_dir):
    """As-of join (operator Spark lacks natively; union-tag + window
    composition) — oracle: DuckDB's native ASOF LEFT JOIN."""
    from xs_vlm_ocr_spark.operators.asof import asof_join

    ev = _doc_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("event_id").alias("purchase_event"),
    )
    out = asof_join(clicks, purchases, key="user_id", left_ts="ts",
                    right_ts="p_ts", payload_cols=["purchase_event"])
    return out.select("event_id", "user_id", "purchase_event")


def _q_sessionize(spark, sf_dir):
    from xs_vlm_ocr_spark.operators.asof import sessionize

    ev = _doc_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return sessionize(ev, key="user_id", ts_col="ts").select(
        "user_id", "event_id", "session_seq"
    )


def _q_topk_per_group(spark, sf_dir):
    orders = _doc_table(spark, sf_dir, "orders")
    cust = _doc_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    from pyspark.sql import Window
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "o_orderkey", "rk")
    )


def _q_events_cube(spark, sf_dir):
    ev = _doc_table(spark, sf_dir, "events")
    return (
        ev.cube("event_type", F.dayofmonth(F.col("ts").cast("timestamp")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_events_daily_pivot(spark, sf_dir):
    ev = _doc_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.dayofmonth(F.col("ts").cast("timestamp")).alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .withColumnsRenamed({t: f"n_{t}" for t in
                             ["click", "view", "purchase", "signup", "error"]})
    )


def _q_value_percentiles(spark, sf_dir):
    ev = _doc_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


def _q_streaming_hourly_rollup(spark, sf_dir):
    """The same hourly rollup as a genuine Structured Streaming query
    (file source -> watermarked tumbling window -> memory sink), run to
    completion; oracle = the batch SQL."""
    from xs_vlm_ocr_spark.streaming.incremental import windowed_doc_metrics

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(F.col("ts").cast("timestamp").alias("ts"))
    )
    agg = windowed_doc_metrics(stream, "ts", "1 hour", "2 hours")
    name = "stream_rollup_out"
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(name)




def _q_glm_cleanup(spark, sf_dir):
    """Model-output normalization chain (reference GLMAdapter post-
    processing) applied to synthetically wrapped doc text."""
    from xs_vlm_ocr_spark.functions.cleanup import glm_cleanup_chain

    docs = _doc_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit('<|begin_of_box|>: "'), F.col("text"), F.lit('",<|end_of_box|>')
    )
    return docs.select("doc_id", glm_cleanup_chain(raw).alias("clean"))


def _q_json_response_parse(spark, sf_dir):
    """Schema-tolerant response parse (reference Doubao 3-way fallback +
    error surfacing) over per-event synthetic response shapes."""
    from xs_vlm_ocr_spark.functions.cleanup import parse_response_with_fallbacks

    ev = _doc_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    resp = (
        F.when(F.col("event_type") == "click",
               F.concat(F.lit('{"output":{"text":"'), uid, F.lit('"}}')))
        .when(F.col("event_type") == "view",
              F.concat(F.lit('{"choices":[{"message":{"content":"'), uid, F.lit('"}}]}')))
        .when(F.col("event_type") == "error",
              F.concat(F.lit('{"error":{"message":"'), uid, F.lit('"}}')))
        .otherwise(F.concat(F.lit('{"output_text":"'), uid, F.lit('"}')))
    )
    return ev.select("event_id", parse_response_with_fallbacks(resp).alias("parsed"))


def _q_scalar_functions(spark, sf_dir):
    """§2.9 scalar parity batch: base64 payload encode, epoch-ms
    round-trip, day-end clamp, preview projection in one scan."""
    from xs_vlm_ocr_spark.operators.history import day_end_clamp

    ev = _doc_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return ev.select(
        "event_id",
        F.base64(F.encode(F.col("event_type"), "utf-8")).alias("b64_type"),
        F.unix_millis(ts).alias("epoch_ms"),
        F.unix_micros(day_end_clamp(ts)).alias("day_end_us"),
        F.substring(F.regexp_replace("props", "\\n", " "), 1, 10).alias("props_preview"),
    )




def _q_running_window_agg(spark, sf_dir):
    """Cumulative per-key window aggregation (frame-based running sum —
    exact decimal math so both engines agree bit-for-bit)."""
    from pyspark.sql import Window

    ev = _doc_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.sum(F.col("value").cast("decimal(14,4)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("seq"),
    )


def _q_semi_anti_set_ops(spark, sf_dir):
    """Explicit left-semi / left-anti forms (EXISTS / NOT EXISTS) plus
    intersect / exceptAll set operations, one (row_key, side) union —
    folded into a single registration so the whole contract surface
    stays inside the driver's 50-query verification window."""
    orders = _doc_table(spark, sf_dir, "orders")
    cust = _doc_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    semi = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi").select(
        F.col("o_orderkey").alias("row_key"), F.lit("building").alias("side")
    )
    anti = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").select(
        F.col("o_orderkey").alias("row_key"), F.lit("other").alias("side")
    )
    docs = _doc_table(spark, sf_dir, "documents").select("doc_id", "lang")
    en = docs.filter(F.col("lang") == "en")
    short = _doc_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") < 300
    ).select("doc_id", "lang")
    sets = (
        en.intersect(short).withColumn("side", F.lit("en_short"))
        .unionByName(en.exceptAll(short).withColumn("side", F.lit("en_long")))
        .select(F.col("doc_id").alias("row_key"), "side")
    )
    return semi.unionByName(anti).unionByName(sets)




def _q_knn_ivf(spark, sf_dir):
    """IVF-cell approximate ANN — with nprobe=n_cells the probe is
    exhaustive, so the exact brute-force oracle applies; the recall/
    compute dial is tested in tests/test_similarity.py."""
    from xs_vlm_ocr_spark.operators.similarity import ivf_topk

    emb = _doc_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 3), dim=64, k=10,
                    n_cells=8, nprobe=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "history_filtered_count": _q_history_filtered_count,
        "history_keyword_search": _q_history_keyword_search,
        "history_page": _q_history_page,
        "history_topn_retention": _q_history_topn_retention,
        "history_latest_per_key": _q_history_latest_per_key,
        "history_point_lookup": _q_history_point_lookup,
        "doc_preview": _q_doc_preview,
        "config_inheritance_join": _q_config_inheritance_join,
        "batch_status_counts": _q_batch_status_counts,
        "char_stats": _q_char_stats,
        "tpch_q1_pricing_summary": _q_tpch_q1,
        "dedup_exact_groups": _q_dedup_exact_groups,
        "dedup_exact_keep_first": _q_dedup_exact_keep_first,
        "dedup_cache_probe": _q_dedup_cache_probe,
        "token_count": _q_token_count,
        "quality_score": _q_quality_score,
        "events_hourly_rollup": _q_events_hourly_rollup,
        "knn_topk_cosine": _q_knn_topk_cosine,
        "extract_flagship": _q_extract_flagship,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "embedding_near_dup": _q_embedding_near_dup,
        "lang_id": _q_lang_id,
        "fingerprint_dedup": _q_fingerprint_dedup,
        "minhash_lsh_pairs": _q_minhash_lsh,
        "neardup_clusters": _q_neardup_clusters,
        "neardup_clusters_incremental": _q_neardup_clusters_incremental,
        "ngram_contamination": _q_ngram_contamination,
        "contamination_spans": _q_contamination_spans,
        "repetition_signals": _q_repetition_signals,
        "deduped_kept_corpus": _q_deduped_kept_corpus,
        "incremental_minhash_probe": _q_incremental_minhash,
        "minhash_index_maintenance": _q_minhash_index_maintenance,
        "simhash_near_pairs": _q_simhash_near,
        "media_decode": _q_media_decode,
        "strategy_inheritance": _q_strategy_inheritance,
        "prompt_templates": _q_prompt_templates,
        "asof_join": _q_asof_join,
        "sessionize": _q_sessionize,
        "topk_per_group": _q_topk_per_group,
        "events_cube": _q_events_cube,
        "events_daily_pivot": _q_events_daily_pivot,
        "value_percentiles": _q_value_percentiles,
        "streaming_hourly_rollup": _q_streaming_hourly_rollup,
        "glm_cleanup": _q_glm_cleanup,
        "json_response_parse": _q_json_response_parse,
        "scalar_functions": _q_scalar_functions,
        "running_window_agg": _q_running_window_agg,
        "semi_anti_set_ops": _q_semi_anti_set_ops,
    }


def oracle_sql() -> dict[str, str]:
    oracles = {
        "history_filtered_count": """
            SELECT count(*) AS total FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <= TIMESTAMP '2024-01-20 23:59:59'
              AND (lower(event_type) LIKE '%click%' OR lower(props) LIKE '%click%')
        """,
        "history_keyword_search": """
            SELECT event_id, event_type, props FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND (lower(event_type) LIKE '%9%' OR lower(props) LIKE '%9%')
        """,
        "history_page": """
            SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 20 OFFSET 40
        """,
        "history_topn_retention": """
            SELECT event_id, epoch_us(ts) AS ts_us FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 100
        """,
        "history_latest_per_key": """
            SELECT user_id, event_type, event_id AS latest_event_id FROM (
                SELECT user_id, event_type, event_id,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "history_point_lookup": """
            SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
            FROM events WHERE event_id = 4242
        """,
        "doc_preview": """
            SELECT doc_id, substr(replace(text, chr(10), ' '), 1, 50) AS preview
            FROM documents
        """,
        "config_inheritance_join": """
            SELECT c_custkey,
                   coalesce(nullif(c_mktsegment, ''), n_name) AS segment_or_nation,
                   n_name AS nation_name
            FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        """,
        "batch_status_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "char_stats": """
            -- CAST: DuckDB sum(int) is HUGEINT; Spark's is BIGINT
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
            GROUP BY l_returnflag, l_linestatus
        """,
        "dedup_exact_groups": """
            SELECT md5(substr(text, 1, 24)) AS h, count(*) AS n_dupes,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_exact_keep_first": """
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d
            JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_id
                  FROM documents GROUP BY 1) w
              ON md5(d.text) = w.h AND d.doc_id = w.doc_id
        """,
        "dedup_cache_probe": """
            SELECT doc_id FROM documents
            WHERE md5(text) NOT IN (
                SELECT md5(text) FROM documents WHERE doc_id % 2 = 0
            )
        """,
        "token_count": f"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '{WS_RE}')) AS n_tokens,
                   len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '{WS_RE}')) AS n_tokens,
                   (CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END
                    + CASE WHEN length(text) * 1.0
                               / greatest(len(regexp_split_to_array(trim(text), '{WS_RE}')), 1)
                               BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END
                    + CASE WHEN length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                               / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END
                   ) / 3.0 AS quality
            FROM documents
        """,
        "events_hourly_rollup": """
            SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
                   count(*) AS n, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "knn_lsh": _knn_lsh_oracle_sql(),
        "knn_topk_cosine": """
            WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id nid, embedding ne FROM embeddings),
            pairs AS (
              SELECT qid, nid,
                list_sum(list_transform(list_zip(qe, ne),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
                sqrt(list_sum(list_transform(qe,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
                sqrt(list_sum(list_transform(ne,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nn
              FROM q CROSS JOIN c WHERE qid <> nid
            )
            SELECT qid AS query_id, nid AS neighbor_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY dot/(nq*nn) DESC, nid) AS knn_rank
            FROM pairs QUALIFY knn_rank <= 10
        """,
        "simhash_near_pairs": f"""
            WITH toks AS (
              SELECT DISTINCT doc_id, tok AS g
              FROM (SELECT doc_id,
                           unnest(regexp_split_to_array(lower(trim(text)), '{WS_RE}')) AS tok
                    FROM documents)
              WHERE tok <> ''
            ),
            th AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
              FROM toks
            ),
            votes AS (
              SELECT doc_id, p.j AS j,
                     CASE WHEN 2 * sum((h >> p.j) & 1) > count(*)
                          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS v
              FROM th, LATERAL (SELECT unnest(range(0, 60)) AS j) AS p
              GROUP BY doc_id, p.j
            ),
            fps AS (
              SELECT doc_id,
                     sum(v << j) AS simhash,
                     CAST(j // 15 AS INT) AS band,
                     sum(v << (j % 15)) AS chunk
              FROM votes GROUP BY doc_id, j // 15
            ),
            tot AS (
              SELECT doc_id, sum(v << j) AS simhash FROM votes GROUP BY doc_id
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM fps x JOIN fps y USING (band, chunk)
              WHERE x.doc_id < y.doc_id
            )
            SELECT c.a, c.b,
                   CAST(bit_count(xor(ta.simhash, tb.simhash)) AS INT) AS hamming
            FROM cand c
            JOIN tot ta ON ta.doc_id = c.a
            JOIN tot tb ON tb.doc_id = c.b
            WHERE bit_count(xor(ta.simhash, tb.simhash)) <= 3
        """,
        "minhash_lsh_pairs": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            mins AS (
              SELECT doc_id, p.i AS i,
                     min(CAST(('0x' || substr(
                           md5(CAST(p.i AS VARCHAR) || '|' || g), 1, 15))
                         AS BIGINT)) AS m
              FROM grams, LATERAL (SELECT unnest(range(0, 16)) AS i) AS p
              GROUP BY doc_id, p.i
            ),
            buckets AS (
              SELECT doc_id, CAST(i // 4 AS INT) AS band,
                     md5(CAST(i // 4 AS VARCHAR) || '|' || string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
              FROM mins GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM buckets x JOIN buckets y USING (bucket)
              WHERE x.doc_id < y.doc_id
            )
            SELECT c.a, c.b,
                   CAST(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
                     / 16.0 AS est_jaccard
            FROM cand c
            JOIN mins ma ON ma.doc_id = c.a
            JOIN mins mb ON mb.doc_id = c.b AND mb.i = ma.i
            GROUP BY c.a, c.b
            HAVING CAST(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
                     / 16.0 >= 0.5
        """,
        "neardup_clusters": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            mins AS (
              SELECT doc_id, p.i AS i,
                     min(CAST(('0x' || substr(
                           md5(CAST(p.i AS VARCHAR) || '|' || g), 1, 15))
                         AS BIGINT)) AS m
              FROM grams, LATERAL (SELECT unnest(range(0, 16)) AS i) AS p
              GROUP BY doc_id, p.i
            ),
            buckets AS (
              SELECT doc_id, CAST(i // 4 AS INT) AS band,
                     md5(CAST(i // 4 AS VARCHAR) || '|' || string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
              FROM mins GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM buckets x JOIN buckets y USING (bucket)
              WHERE x.doc_id < y.doc_id
            ),
            prs AS (
              SELECT c.a, c.b
              FROM cand c
              JOIN mins ma ON ma.doc_id = c.a
              JOIN mins mb ON mb.doc_id = c.b AND mb.i = ma.i
              GROUP BY c.a, c.b
              HAVING CAST(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
                       / 16.0 >= 0.5
            ),
            edges AS (
              SELECT a AS u, b AS v FROM prs
              UNION SELECT b AS u, a AS v FROM prs
            ),
            reach AS (
              SELECT u AS node, u AS r FROM edges
              UNION
              SELECT e.v AS node, reach.r AS r
              FROM reach JOIN edges e ON e.u = reach.node
            ),
            comp AS (
              SELECT node, min(r) AS cluster FROM reach GROUP BY node
            )
            SELECT d.doc_id,
                   coalesce(c.cluster, d.doc_id) AS cluster_id,
                   CAST(CASE WHEN coalesce(c.cluster, d.doc_id) = d.doc_id
                        THEN 1 ELSE 0 END AS INT) AS is_canonical
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        """,
        "ngram_contamination": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            te AS (SELECT DISTINCT g FROM grams WHERE doc_id % 5 = 0)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
            FROM grams JOIN te USING (g)
            WHERE doc_id % 5 <> 0
            GROUP BY doc_id
            HAVING count(*) >= 1
        """,
        "contamination_spans": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            tr AS (
              SELECT doc_id, CAST(i.i - 1 AS BIGINT) AS pos,
                     array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE doc_id % 5 <> 0
                AND array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            te AS (
              SELECT DISTINCT array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE doc_id % 5 = 0
                AND array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            hits AS (SELECT tr.doc_id, tr.pos FROM tr JOIN te USING (g)),
            flags AS (
              SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(max(pos + 3) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                          ), -1) THEN 1 ELSE 0 END AS ni
              FROM hits
            ),
            isl AS (
              SELECT doc_id, pos,
                     sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS k
              FROM flags
            )
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
                   CAST(max(pos) + 3 AS BIGINT) AS end_tok
            FROM isl GROUP BY doc_id, k
        """,
        "repetition_signals": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            occ AS (
              -- docs with < n tokens yield NO gram (range is empty) —
              -- mirrors the Spark side's size(toks) >= n gate
              SELECT doc_id, array_to_string(t[i.i : i.i+1], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-1, 0) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+1], ' ') <> ''
            ),
            counts AS (
              SELECT doc_id, g, count(*) AS _n FROM occ GROUP BY doc_id, g
            ),
            per_doc AS (
              SELECT doc_id, CAST(sum(_n) AS BIGINT) AS n_grams,
                     CAST(count(*) AS BIGINT) AS n_distinct_grams
              FROM counts GROUP BY doc_id
            ),
            top AS (
              SELECT doc_id, g, _n FROM (
                SELECT doc_id, g, _n,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY _n DESC, g ASC) AS rn
                FROM counts
              ) WHERE rn = 1
            )
            SELECT d.doc_id,
                   coalesce(p.n_grams, 0) AS n_grams,
                   coalesce(p.n_distinct_grams, 0) AS n_distinct_grams,
                   coalesce(CAST(p.n_grams - p.n_distinct_grams AS DOUBLE)
                              / p.n_grams, 0.0) AS dup_gram_frac,
                   coalesce(t.g, '') AS top_gram,
                   coalesce(CAST(t._n AS DOUBLE) / p.n_grams, 0.0) AS top_gram_frac
            FROM documents d
            LEFT JOIN per_doc p ON p.doc_id = d.doc_id
            LEFT JOIN top t ON t.doc_id = d.doc_id
        """,
        "minhash_index_maintenance": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            mins AS (
              SELECT doc_id, p.i AS i,
                     min(CAST(('0x' || substr(
                           md5(CAST(p.i AS VARCHAR) || '|' || g), 1, 15))
                         AS BIGINT)) AS m
              FROM grams, LATERAL (SELECT unnest(range(0, 16)) AS i) AS p
              GROUP BY doc_id, p.i
            )
            SELECT doc_id, CAST(i // 4 AS INT) AS band,
                   md5(CAST(i // 4 AS VARCHAR) || '|' || string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
            FROM mins GROUP BY doc_id, i // 4
        """,
        "incremental_minhash_probe": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            mins AS (
              SELECT doc_id, p.i AS i,
                     min(CAST(('0x' || substr(
                           md5(CAST(p.i AS VARCHAR) || '|' || g), 1, 15))
                         AS BIGINT)) AS m
              FROM grams, LATERAL (SELECT unnest(range(0, 16)) AS i) AS p
              GROUP BY doc_id, p.i
            ),
            buckets AS (
              SELECT doc_id, CAST(i // 4 AS INT) AS band,
                     md5(CAST(i // 4 AS VARCHAR) || '|' || string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
              FROM mins GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM buckets x JOIN buckets y USING (bucket)
              WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
                AND x.doc_id <> y.doc_id
            )
            SELECT c.a, c.b,
                   CAST(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
                     / 16.0 AS est_jaccard
            FROM cand c
            JOIN mins ma ON ma.doc_id = c.a
            JOIN mins mb ON mb.doc_id = c.b AND mb.i = ma.i
            GROUP BY c.a, c.b
            HAVING CAST(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS DOUBLE)
                     / 16.0 >= 0.5
        """,
        "ngram_jaccard_pairs": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '{WS_RE}') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i+2], ' ') AS g
              FROM toks,
                   LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1) + 1)) AS i) AS i
              WHERE array_to_string(t[i.i : i.i+2], ' ') <> ''
            ),
            sizes AS (SELECT doc_id, count(*) n_sh FROM grams GROUP BY 1),
            inter AS (
              SELECT a.doc_id a, b.doc_id b, count(*) inter
              FROM grams a JOIN grams b USING (g)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT a, b, inter, sa.n_sh AS na, sb.n_sh AS nb
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
        """,
        "embedding_near_dup": """
            SELECT a, b, 't04' AS regime FROM (
              WITH v AS (SELECT vec_id, embedding FROM embeddings),
              pairs AS (
                SELECT x.vec_id a, y.vec_id b,
                  list_sum(list_transform(list_zip(x.embedding, y.embedding),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
                  sqrt(list_sum(list_transform(x.embedding,
                           e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS nx,
                  sqrt(list_sum(list_transform(y.embedding,
                           e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS ny
                FROM v x JOIN v y ON x.vec_id < y.vec_id
              )
              SELECT a, b FROM pairs WHERE dot / (nx * ny) >= 0.4
            )
            UNION ALL
            SELECT a, b, 't09' AS regime FROM (
              WITH v AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
              ),
              pairs AS (
                SELECT x.vec_id a, y.vec_id b,
                  list_sum(list_transform(list_zip(x.embedding, y.embedding),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
                  sqrt(list_sum(list_transform(x.embedding,
                           e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS nx,
                  sqrt(list_sum(list_transform(y.embedding,
                           e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS ny
                FROM v x JOIN v y ON x.vec_id < y.vec_id
              )
              SELECT a, b FROM pairs WHERE dot / (nx * ny) >= 0.9
            )
        """,
        "lang_id": _lang_id_oracle_sql(),
        "fingerprint_dedup": f"""
            SELECT CAST(('0x' || substr(
                     md5(regexp_replace(trim(text), '{WS_RE}', ' ', 'g')), 1, 15))
                   AS BIGINT) AS fp,
                   count(*) AS n, min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1
        """,
        "media_decode": """
            SELECT 'img://' || CAST(doc_id AS VARCHAR) AS media_ref,
                   64 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) * 8
                     AS width,
                   64 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) * 8
                     AS height,
                   CASE WHEN CAST(('0x' || substr(sha256(text), 5, 2)) AS INT)
                             % 2 = 0
                        THEN 'RGB' ELSE 'RGBA' END AS mode
            FROM documents
        """,
        "strategy_inheritance": """
            WITH providers(id, api_host, api_key) AS (
              VALUES ('p1', 'https://p1', 'K1'), ('p2', 'https://p2', '')
            ),
            models(id, provider, own_key, enabled) AS (
              VALUES ('m1', 'p1', 'OWN', true), ('m2', 'p1', NULL, false),
                     ('m3', 'p2', NULL, true)
            )
            SELECT m.id,
                   coalesce(nullif(p.api_host, ''), '') AS api_host,
                   coalesce(m.own_key, nullif(p.api_key, ''), '') AS api_key,
                   m.enabled
            FROM models m LEFT JOIN providers p ON m.provider = p.id
        """,
        "extract_flagship": """
            SELECT doc_id, kind, text, media_ref, "order"
            FROM read_parquet('/root/repo/fixtures/flagship_expected_sf0.01.parquet')
        """,
        "prompt_templates": """
            WITH t(name, content, type, category, pos) AS (VALUES
              ('extract', 'extract main content', 'recognize', 'general', 0),
              ('table', 'extract tables as markdown', 'recognize', 'table', 1),
              ('formula', 'extract formulas as latex', 'recognize', 'formula', 2),
              ('translate_en', 'translate to english', 'translate', 'general', 3),
              ('solve', 'solve step by step', 'solve', 'general', 4),
              ('summarize', 'organize into a summary', 'organize', 'general', 5)
            ),
            ord(type, type_rank) AS (VALUES
              ('recognize', 1), ('translate', 2), ('solve', 3), ('organize', 4)
            )
            SELECT t.type, CAST(ord.type_rank AS INT) AS type_rank,
                   CAST(row_number() OVER (PARTITION BY t.type ORDER BY t.pos)
                        AS INT) AS slot,
                   t.name, t.category,
                   t.name || ' [' || t.category || ']' AS label,
                   t.content
            FROM t JOIN ord USING (type)
        """,
        "asof_join": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            ),
            purchases AS (
              SELECT user_id, ts AS p_ts, event_id AS purchase_event
              FROM events WHERE event_type = 'purchase'
            )
            SELECT c.event_id, c.user_id, p.purchase_event
            FROM clicks c ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.ts >= p.p_ts
        """,
        "sessionize": """
            -- CAST: DuckDB windowed sum(int) is HUGEINT; Spark's is BIGINT
            SELECT user_id, event_id,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                             OR ts > prev_ts + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
              FROM events
            )
        """,
        "topk_per_group": """
            SELECT c_nationkey, o_orderkey, rk FROM (
              SELECT c.c_nationkey, o.o_orderkey,
                     row_number() OVER (PARTITION BY c.c_nationkey
                                        ORDER BY o.o_totalprice DESC,
                                                 o.o_orderkey ASC) AS rk
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rk <= 3
        """,
        "events_cube": """
            SELECT event_type, dayofmonth(ts) AS day, count(*) AS n
            FROM events GROUP BY CUBE (event_type, dayofmonth(ts))
        """,
        "events_daily_pivot": """
            SELECT dayofmonth(ts) AS day,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'view') AS n_view,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'error') AS n_error
            FROM events GROUP BY 1
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.95), 6) AS p95
            FROM events GROUP BY event_type
        """,
        "streaming_hourly_rollup": """
            SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
                   count(*) AS n_docs
            FROM events GROUP BY 1
        """,
        "glm_cleanup": """
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                     trim(regexp_replace(
                       trim(regexp_replace(
                         '<|begin_of_box|>: "' || text || '",<|end_of_box|>',
                         '<\|begin_of_box\|>|<\|end_of_box\|>', '', 'g')),
                       '^:', '')),
                     '^"(.*)"$', '\1'), ',$', '')) AS clean
            FROM documents
        """,
        "json_response_parse": """
            SELECT event_id,
                   coalesce(
                     json_extract_string(resp, '$.output.text'),
                     json_extract_string(resp, '$.choices[0].message.content'),
                     json_extract_string(resp, '$.output_text'),
                     'ERROR: ' || json_extract_string(resp, '$.error.message')
                   ) AS parsed
            FROM (
              SELECT event_id,
                     CASE WHEN event_type = 'click'
                          THEN '{"output":{"text":"' || user_id || '"}}'
                          WHEN event_type = 'view'
                          THEN '{"choices":[{"message":{"content":"' || user_id || '"}}]}'
                          WHEN event_type = 'error'
                          THEN '{"error":{"message":"' || user_id || '"}}'
                          ELSE '{"output_text":"' || user_id || '"}' END AS resp
              FROM events
            )
        """,
        "scalar_functions": """
            SELECT event_id,
                   to_base64(encode(event_type)) AS b64_type,
                   epoch_ms(ts) AS epoch_ms,
                   epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY
                            - INTERVAL 1 SECOND) AS day_end_us,
                   substr(replace(props, chr(10), ' '), 1, 10) AS props_preview
            FROM events
        """,
        "running_window_agg": """
            SELECT user_id, event_id,
                   CAST(sum(CAST(value AS DECIMAL(14,4)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
                   count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS seq
            FROM events
        """,
        "semi_anti_set_ops": """
            SELECT o_orderkey AS row_key, 'building' AS side FROM orders o
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_mktsegment = 'BUILDING')
            UNION ALL
            SELECT o_orderkey AS row_key, 'other' AS side FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_mktsegment = 'BUILDING')
            UNION ALL
            SELECT doc_id AS row_key, 'en_short' AS side FROM (
              SELECT DISTINCT doc_id, lang FROM documents WHERE lang = 'en'
              INTERSECT
              SELECT DISTINCT doc_id, lang FROM documents WHERE n_chars < 300
            )
            UNION ALL
            SELECT doc_id AS row_key, 'en_long' AS side FROM (
              SELECT doc_id, lang FROM documents WHERE lang = 'en'
              EXCEPT ALL
              SELECT doc_id, lang FROM documents WHERE n_chars < 300
            )
        """,
        "knn_ivf": """
            WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id nid, embedding ne FROM embeddings),
            pairs AS (
              SELECT qid, nid,
                list_sum(list_transform(list_zip(qe, ne),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
                sqrt(list_sum(list_transform(qe,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
                sqrt(list_sum(list_transform(ne,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nn
              FROM q CROSS JOIN c WHERE qid <> nid
            )
            SELECT qid AS query_id, nid AS neighbor_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY dot/(nq*nn) DESC, nid) AS knn_rank
            FROM pairs QUALIFY knn_rank <= 10
        """,
    }
    # the incremental maintenance path must produce the SAME
    # assignment as the full closure — one oracle, two plans
    oracles["neardup_clusters_incremental"] = oracles["neardup_clusters"]
    # the corpus-cleaning decision composes three ALREADY-VERIFIED
    # oracles (near-dup closure, contamination spans, repetition
    # signals) plus the quality score, then mirrors decide_corpus's
    # span surgery with an unnest-based token-window cut
    oracles["deduped_kept_corpus"] = f"""
        WITH clusters AS ({oracles["neardup_clusters"]}),
        spans AS ({oracles["contamination_spans"]}),
        sig AS ({oracles["repetition_signals"]}),
        qual AS ({oracles["quality_score"]}),
        sp_docs AS (SELECT DISTINCT doc_id FROM spans),
        surg AS (
          SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
          FROM (
            SELECT d.doc_id, CAST(i.i - 1 AS BIGINT) AS pos, d.tk[i.i] AS tok
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '{WS_RE}') AS tk
                  FROM documents
                  WHERE doc_id IN (SELECT doc_id FROM sp_docs)) d,
                 LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) AS i
          ) t
          WHERE NOT EXISTS (SELECT 1 FROM spans s
                            WHERE s.doc_id = t.doc_id
                              AND t.pos >= s.start_tok AND t.pos < s.end_tok)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CASE WHEN c.is_canonical = 0 THEN 'duplicate'
                    WHEN q.quality < 0.9 OR r.top_gram_frac > 0.08
                      THEN 'quality'
                    ELSE 'kept' END AS reason,
               CAST(CASE WHEN sp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
                 AS was_trimmed,
               CASE WHEN sp.doc_id IS NOT NULL THEN coalesce(g.clean_text, '')
                    ELSE d.text END AS text
        FROM documents d
        JOIN clusters c ON c.doc_id = d.doc_id
        JOIN sig r ON r.doc_id = d.doc_id
        JOIN qual q ON q.doc_id = d.doc_id
        LEFT JOIN sp_docs sp ON sp.doc_id = d.doc_id
        LEFT JOIN surg g ON g.doc_id = d.doc_id
    """
    return oracles
