"""Connected components (pairs -> dedup clusters): golden graphs +
union-find equivalence property."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from xs_vlm_ocr_spark.operators.components import (
    assign_clusters,
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member id per component
    comp_min: dict[int, int] = {}
    for n in list(parent):
        comp_min.setdefault(find(n), min(find(n), n))
    return {n: comp_min[find(n)] for n in parent}


def test_chain_collapses_to_min(spark):
    # worst case for naive label propagation: a long chain
    import math

    from xs_vlm_ocr_spark.operators import components as C

    edges = [(i, i + 1) for i in range(1, 64)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 65)}
    # O(log n) convergence, not O(diameter): a 64-node chain would take
    # ~64 rounds of naive label propagation
    assert C.LAST_ROUNDS <= 2 * math.ceil(math.log2(64)) + 2


def test_two_components_and_duplicates(spark):
    edges = [(5, 3), (3, 7), (20, 30), (30, 20), (7, 5), (7, 7)]
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 7: 3, 20: 20, 30: 20}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        assert _cc(spark, edges) == _union_find(edges), f"trial {trial}: {edges}"


def test_assign_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "a long, b long")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in assign_clusters(docs, pairs).collect()
    }
    assert out == {
        1: (1, 1),
        2: (2, 1),
        3: (3, 1),
        4: (2, 0),
        5: (5, 1),
        6: (2, 0),
    }
    # exactly one canonical row per cluster
    canon = [d for d, (_, c) in out.items() if c == 1]
    assert sorted(canon) == [1, 2, 3, 5]


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "a long, b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = assign_clusters(docs, pairs).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == {1: 1, 2: 2}
    assert all(r["is_canonical"] == 1 for r in rows)


def test_incremental_equals_full_on_random_batches(spark):
    """Star compression preserves connectivity: updating a previous
    assignment with only the NEW pairs is bit-equal to a full CC over
    the union — the property that makes per-ingest cluster maintenance
    O(nodes + new pairs) instead of O(all pairs ever)."""
    from xs_vlm_ocr_spark.operators.components import incremental_components

    rng = random.Random(7)
    for trial in range(3):
        n = 50
        all_edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 70))
        ]
        all_edges = [e for e in all_edges if e[0] != e[1]]
        cut = len(all_edges) // 2
        e1, e2 = all_edges[:cut], all_edges[cut:]
        if not e1 or not e2:
            continue
        prev = connected_components(
            spark.createDataFrame(e1, "a long, b long")
        )
        inc = incremental_components(
            prev, spark.createDataFrame(e2, "a long, b long")
        )
        got = {r["node"]: r["component"] for r in inc.collect()}
        assert got == _union_find(all_edges), f"trial {trial}"


def test_incremental_preserves_singleton_prev_nodes(spark):
    """A previous root/singleton with no new pair stays in the output
    (closed under composition)."""
    from xs_vlm_ocr_spark.operators.components import incremental_components

    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 9)], "node long, component long"
    )
    inc = incremental_components(
        prev, spark.createDataFrame([(2, 5)], "a long, b long")
    )
    got = {r["node"]: r["component"] for r in inc.collect()}
    assert got == {1: 1, 2: 1, 5: 1, 9: 9}


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=0)
