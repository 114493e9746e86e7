"""Strategy config: provider inheritance join, enabled filter, fallback
selection, canonical param hashing, and engine dispatch."""

import pyspark.sql.functions as F
import pytest

from xs_vlm_ocr_spark import strategies as S

CONFIG = {
    "providers": [
        {"id": "p1", "name": "ProvOne", "api_host": "https://p1", "api_key": "K1"},
        {"id": "p2", "name": "ProvTwo", "api_host": "https://p2", "api_key": ""},
    ],
    "models": [
        {"id": "m1", "display_name": "M1", "type": "online", "engine": "main_content_v1",
         "provider": "p1", "params": {"api_key": "OWN", "temperature": "0.1"}, "enabled": True},
        {"id": "m2", "display_name": "M2", "type": "online", "engine": "passthrough",
         "provider": "p1", "params": {}, "enabled": False},
        {"id": "m3", "display_name": "M3", "type": "online", "engine": "unregistered_engine",
         "provider": "p2", "params": {}, "enabled": True},
        {"id": "m4", "display_name": "M4", "type": "local", "engine": "passthrough",
         "provider": "p2", "params": {"api_host": ""}, "enabled": True},
    ],
}


@pytest.fixture(scope="module")
def inherited(spark):
    models = S.strategies_df(spark, CONFIG)
    provs = S.providers_df(spark, CONFIG)
    return {r["id"]: r for r in S.inherit_provider_params(models, provs).collect()}


def test_model_param_wins_over_provider(inherited):
    assert inherited["m1"]["params"]["api_key"] == "OWN"
    assert inherited["m1"]["params"]["api_host"] == "https://p1"
    assert inherited["m1"]["params"]["temperature"] == "0.1"


def test_provider_fills_missing(inherited):
    assert inherited["m2"]["params"]["api_key"] == "K1"
    # empty provider value stays empty (nothing to inherit)
    assert inherited["m3"]["params"]["api_key"] == ""
    assert inherited["m4"]["params"]["api_host"] == "https://p2"


def test_enabled_filter_and_fallback(spark):
    models = S.strategies_df(spark, CONFIG)
    assert {r["id"] for r in S.enabled_strategies(models).collect()} == {"m1", "m3", "m4"}
    assert S.select_strategy(models, "m1") == "m1"
    assert S.select_strategy(models, "m2") == "m1"   # disabled -> first enabled registered
    assert S.select_strategy(models, "m3") == "m1"   # unregistered engine -> fallback


def test_canonical_param_string_excludes_secrets(spark):
    df = spark.createDataFrame(
        [({"b": "2", "api_key": "SECRET", "a": "1", "access_token": "T"},)],
        "params map<string,string>",
    )
    got = df.select(S.canonical_param_string(F.col("params")).alias("c")).first()["c"]
    assert got == "a=1;b=2"


def test_engine_dispatch_changes_extraction(spark):
    from xs_vlm_ocr_spark.corpus import gen_docs_df
    from xs_vlm_ocr_spark.operators.extraction import extract_spans, split_extraction_output

    docs = gen_docs_df(spark, 10)
    main, _ = split_extraction_output(extract_spans(docs, "main_content_v1"))
    raw, _ = split_extraction_output(extract_spans(docs, "passthrough"))
    m = {r["doc_id"]: r["full_text"] for r in main.collect()}
    p = {r["doc_id"]: r["full_text"] for r in raw.collect()}
    # passthrough keeps boilerplate -> strictly more text on html docs
    assert any(len(p[d]) > len(m[d]) for d in m)
    assert all(len(p[d]) >= len(m[d]) > 0 or p[d] == m[d] for d in m)


def test_arrays_and_dict_paths_produce_identical_output(spark):
    """The mapInPandas stage takes the arrays fast path when a strategy
    exposes `arrays_impl` and the dict-adapter fallback otherwise. Both
    conventions must yield byte-identical rows for the same extractor —
    pin it by registering the canonical extract_doc WITHOUT its
    arrays_impl attribute and diffing full outputs."""
    from xs_vlm_ocr_spark.corpus import gen_docs_df
    from xs_vlm_ocr_spark.extract.pipeline import extract_doc
    from xs_vlm_ocr_spark.operators.extraction import extract_spans, split_extraction_output

    def dict_only(spans):  # same semantics, no arrays_impl attribute
        return extract_doc(spans)

    S.REGISTRY["dict_only_test"] = dict_only
    try:
        docs = gen_docs_df(spark, 30)
        fast, _ = split_extraction_output(extract_spans(docs, "main_content_v1"))
        slow, _ = split_extraction_output(extract_spans(docs, "dict_only_test"))
        key = lambda r: r["doc_id"]  # noqa: E731
        a = sorted(
            ((r["doc_id"], r["success"], r["full_text"],
              tuple((s["kind"], s["text"], s["media_ref"], s["order"])
                    for s in (r["spans_out"] or [])))
             for r in fast.collect()), key=lambda t: t[0])
        b = sorted(
            ((r["doc_id"], r["success"], r["full_text"],
              tuple((s["kind"], s["text"], s["media_ref"], s["order"])
                    for s in (r["spans_out"] or [])))
             for r in slow.collect()), key=lambda t: t[0])
        assert a == b
    finally:
        del S.REGISTRY["dict_only_test"]
