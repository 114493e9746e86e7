"""Physical-plan audit: assert the plan-shape invariants that matter at
100 TB, over the real registered queries, and write PLAN_AUDIT.md.

Checks per query (executed plan at sf0.01, AQE final):
  * no CartesianProduct / BroadcastNestedLoopJoin — except queries
    explicitly whitelisted (exact all-pairs test oracles are never
    registered);
  * parquet scans carry PushedFilters / partition filters where the
    query is selective;
  * the small side of star joins broadcasts (BroadcastHashJoin);
  * WholeStageCodegen spans exist (expressions stay JVM-side).

Run: python tools/plan_audit.py [sf_dir]   (writes PLAN_AUDIT.md)
Exit code 1 if any invariant fails — usable as a CI gate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# query -> list of (label, predicate) over the executed-plan string
def _has(s):
    return lambda plan: s in plan


def _absent(s):
    return lambda plan: s not in plan


def _codegen(plan):
    # final AQE plans mark codegen'd nodes with "*(n)" stage prefixes
    import re

    return re.search(r"\*\(\d+\)", plan) is not None


CHECKS: dict[str, list[tuple[str, object]]] = {
    "tpch_q1_pricing_summary": [
        ("filter pushed to parquet scan", _has("PushedFilters: [IsNotNull(l_shipdate)")),
        ("map-side partial aggregation", _has("partial_sum")),
        ("whole-stage codegen", _codegen),
        ("no cartesian", _absent("CartesianProduct")),
    ],
    "history_point_lookup": [
        ("point predicate pushed to scan", _has("PushedFilters: [IsNotNull(event_id), EqualTo(event_id")),
        ("no shuffle at all", _absent("Exchange hashpartitioning")),
    ],
    "knn_topk_cosine": [
        ("query side broadcast", _has("BroadcastExchange")),
        ("no cartesian on the scan side", _absent("CartesianProduct")),
        ("partial top-k below the shuffle (WindowGroupLimit)",
         _has("row_number(), 10, Partial")),
    ],
    "dedup_cache_probe": [
        ("anti-join", _has("LeftAnti")),
        ("no cartesian", _absent("CartesianProduct")),
    ],
    "ngram_jaccard_pairs": [
        ("no cartesian (prefix equi-join)", _absent("CartesianProduct")),
        ("no nested-loop join", _absent("BroadcastNestedLoopJoin")),
        ("hash aggregation", _has("HashAggregate")),
    ],
    "embedding_near_dup": [
        ("no cartesian (eps-grid equi-join)", _absent("CartesianProduct")),
        ("no nested-loop join", _absent("BroadcastNestedLoopJoin")),
    ],
    "minhash_lsh_pairs": [
        ("no cartesian (band-bucket equi-join)", _absent("CartesianProduct")),
        ("whole-stage codegen (md5 family all-JVM)", _codegen),
        ("no python UDF anywhere in the plan", _absent("PythonUDF")),
    ],
    "config_inheritance_join": [
        ("dim side broadcast", _has("BroadcastHashJoin")),
    ],
    "history_latest_per_key": [
        ("single window pass", _has("Window")),
        ("no cartesian", _absent("CartesianProduct")),
    ],
    "events_hourly_rollup": [
        ("partial aggregation before shuffle", _has("HashAggregate")),
        ("no cartesian", _absent("CartesianProduct")),
    ],
}


def main() -> int:
    import __spark_entry__ as em
    from xs_vlm_ocr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", cores=8, shuffle_partitions=8)
    queries = em.queries()

    lines = [
        "# PLAN_AUDIT — physical-plan invariants (executed plans, AQE final)",
        "",
        f"Source: `tools/plan_audit.py` over the registered contract queries at `{sf_dir}`.",
        "Each check is a structural assertion on the executed physical plan —",
        "the properties that decide whether the plan survives a 100 TB input",
        "(scan pushdown, broadcast vs shuffle, no quadratic join nodes,",
        "JVM-side codegen). Exit code gates CI.",
        "",
        "| query | check | result |",
        "|---|---|---|",
    ]
    n_fail = 0
    for name, checks in CHECKS.items():
        df = queries[name](spark, sf_dir)
        df.collect()  # execute THIS df's plan so AQE finalizes it
        plan = df._jdf.queryExecution().executedPlan().toString()
        for label, pred in checks:
            ok = pred(plan)
            n_fail += 0 if ok else 1
            lines.append(f"| {name} | {label} | {'PASS' if ok else '**FAIL**'} |")
            print(f"[{'PASS' if ok else 'FAIL'}] {name}: {label}")
    lines += [
        "",
        "Plan-level pytest gates (run in CI): bucketed join skips the big-side",
        "shuffle (`tests/test_bucketing.py`), broadcast dedup probe leaves the",
        "jobs side shuffle-free (`tests/test_dedup_probe.py`), IVF probe scan",
        "carries PartitionFilters (`tests/test_similarity.py`), skew split adds",
        "zero shuffle on unskewed input (`tests/test_skew.py`).",
        "",
    ]
    with open(os.path.join(REPO, "PLAN_AUDIT.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"\nPLAN_AUDIT.md written; {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
