"""Edge cases + plan pins for the Gopher-style repetition signals and
the train/test n-gram contamination operator (the sf0.01 contract run
exercises the bulk path; these pin the boundaries it can miss)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xs_vlm_ocr_spark.operators.text_analysis import repetition_signals
from xs_vlm_ocr_spark.operators.text_dedup import (
    contamination_spans,
    ngram_contamination,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts, start=1)], "doc_id long, text string"
    )


def _rep(spark, texts, n=2):
    rows = repetition_signals(_docs(spark, texts), n=n).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_repetition_counts_and_fracs(spark):
    got = _rep(spark, ["a a a a"])[1]
    # 2-grams of [a,a,a,a]: "a a" x3
    assert got["n_grams"] == 3
    assert got["n_distinct_grams"] == 1
    assert got["dup_gram_frac"] == (3 - 1) / 3
    assert got["top_gram"] == "a a"
    assert got["top_gram_frac"] == 1.0


def test_repetition_top_gram_tie_is_lexicographic(spark):
    got = _rep(spark, ["x y x z"])[1]
    # grams "x y", "y x", "x z" each once -> deterministic lexicographic min
    assert got["n_grams"] == 3 and got["n_distinct_grams"] == 3
    assert got["top_gram"] == "x y"
    assert got["dup_gram_frac"] == 0.0


def test_repetition_short_and_empty_docs(spark):
    got = _rep(spark, ["hello", "", "  "])
    # docs with < n tokens have NO gram — a truncated partial gram
    # would flag every one-word doc as maximally repetitious
    for d in (1, 2, 3):
        assert got[d]["n_grams"] == 0
        assert got[d]["dup_gram_frac"] == 0.0
        assert got[d]["top_gram"] == ""
        assert got[d]["top_gram_frac"] == 0.0


def test_repetition_no_window_no_shuffle_in_plan(spark):
    df = repetition_signals(_docs(spark, ["a b c", "a a a"]), n=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # per-doc computation: no corpus window AND no shuffle — the
    # signals never leave the row they belong to
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan


def _contam(spark, train, test, **kw):
    test_df = _docs(spark, test).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    rows = ngram_contamination(_docs(spark, train), test_df, **kw).collect()
    return {r["doc_id"]: r["n_contaminated"] for r in rows}


def test_contamination_flags_overlapping_train_docs(spark):
    train = [
        "the quick brown fox jumps",  # all 3 of its 3-grams are in the test set
        "completely different words here now",
        "the quick brown dog",  # shares "the quick brown" only
    ]
    test = ["the quick brown fox jumps over"]
    got = _contam(spark, train, test, n=3, min_hits=1)
    assert got == {1: 3, 3: 1}


def test_contamination_min_hits_threshold(spark):
    train = ["the quick brown fox jumps", "the quick brown dog"]
    test = ["the quick brown fox jumps over"]
    got = _contam(spark, train, test, n=3, min_hits=2)
    assert got == {1: 3}  # doc2's single hit falls below the threshold


def test_contamination_shuffle_path_matches_broadcast_path(spark):
    train = ["alpha beta gamma delta", "beta gamma delta epsilon", "zeta eta theta"]
    test = ["gamma delta epsilon alpha beta gamma"]
    a = _contam(spark, train, test, n=2, broadcast_test=True)
    b = _contam(spark, train, test, n=2, broadcast_test=False)
    assert a == b and a  # identical and non-empty


def _py_toks(text):
    # exact mirror of the JVM split(lower(trim(x)), WS_RE): trim strips
    # 0x20 only, split keeps edge empty tokens
    import re

    from xs_vlm_ocr_spark.operators.text_analysis import WS_RE

    return re.split(WS_RE, text.strip(" ").lower())


def _py_grams(text, n, partial):
    toks = _py_toks(text)
    if len(toks) < n:
        idx = [0] if partial else []
    else:
        idx = range(len(toks) - n + 1)
    return [g for g in (" ".join(toks[i:i + n]) for i in idx) if g != ""]


def test_repetition_matches_python_mirror_on_random_docs(spark):
    """Batch equivalence against a pure-Python mirror over seeded random
    texts (spaces/tabs/short words — exercises empty tokens, ties,
    sub-n docs)."""
    import random
    from collections import Counter

    rng = random.Random(99)
    alphabet = "ab x\tyz  "
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
             for _ in range(200)]
    got = _rep(spark, texts, n=2)
    for i, t in enumerate(texts, start=1):
        grams = _py_grams(t, 2, partial=False)
        c = Counter(grams)
        n_g, n_d = len(grams), len(c)
        if grams:
            top_n = max(c.values())
            top = min(g for g, k in c.items() if k == top_n)
            exp = (n_g, n_d, (n_g - n_d) * 1.0 / n_g, top, top_n * 1.0 / n_g)
        else:
            exp = (0, 0, 0.0, "", 0.0)
        r = got[i]
        assert (r["n_grams"], r["n_distinct_grams"], r["dup_gram_frac"],
                r["top_gram"], r["top_gram_frac"]) == exp, (i, repr(t))


def test_contamination_matches_python_mirror_on_random_docs(spark):
    import random

    rng = random.Random(7)
    alphabet = "abc de fg  "
    train = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
             for _ in range(80)]
    test = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
            for _ in range(20)]
    got = _contam(spark, train, test, n=2, min_hits=1)
    te = set().union(*(set(_py_grams(t, 2, partial=True)) for t in test)) \
        if test else set()
    exp = {}
    for i, t in enumerate(train, start=1):
        hits = len(set(_py_grams(t, 2, partial=True)) & te)
        if hits >= 1:
            exp[i] = hits
    assert got == exp


def test_contamination_spans_merge_and_partial(spark):
    """Overlapping/adjacent tainted windows merge; disjoint ones don't;
    a sub-n train doc's partial-gram hit spans [0, n)."""
    train = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "zz yy xx"),
         (5, "aa")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "w1 w2 w3"), (101, "w3 w4 w5"), (102, "w7 w8 w9"),
         (103, "aa")],
        "doc_id long, text string",
    )
    out = sorted(tuple(r) for r in contamination_spans(train, test, n=3).collect())
    # hits at pos 1 and 3 merge ([1,4) U [3,6) = [1,6)); pos 7 stays
    # separate; doc 5's partial-gram hit covers [0, 3)
    assert out == [(1, 1, 6), (1, 7, 10), (5, 0, 3)]


def test_contamination_spans_plan(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    test = spark.createDataFrame([(9, "b c")], "doc_id long, text string")
    df = contamination_spans(train, test, n=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan  # test grams broadcast
    assert "Window" not in plan  # interval merge is a per-doc fold


def test_contamination_broadcasts_test_side(spark):
    df = ngram_contamination(
        _docs(spark, ["a b c d", "e f g h"]),
        _docs(spark, ["c d e f"]),
        n=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # the tiny test-gram set must broadcast: the 100 TB train side never
    # shuffles its grams
    assert "BroadcastHashJoin" in plan
