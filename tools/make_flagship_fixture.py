"""Materialize the pure-Python extraction oracle for the flagship query.

The flagship (`extract_flagship` in __spark_entry__.py) is a non-SQL
operator: its correctness gate was golden pytest fixtures only. This
tool computes the EXPECTED output with the pure single-doc extractor
(xs_vlm_ocr_spark.extract.extract_doc — the same independent
implementation the golden tests trust), over the SAME deterministic
interleave of the driver's documents table, and writes it to a parquet
fixture that `oracle_sql()["extract_flagship"]` reads via
read_parquet(). That converts the flagship from rows-only to
value-checked in the driver contract.

The fixture is tied to one sf tier's input (default sf0.01 — the tier
the driver compares at). If the driver regenerates testdata, re-run:

    python tools/make_flagship_fixture.py [sf_dir] [out_parquet]

The input file's md5 is stored alongside as <out>.input_md5 so a stale
fixture is diagnosable.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAV = (
    '<nav><ul><li><a href="#">home</a></li><li><a href="#">about</a></li>'
    '<li><a href="#">contact</a></li></ul></nav><article><p>'
)
FOOTER = "</p></article><footer><p>footer text</p></footer>"

FIXTURE_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "flagship_expected_sf0.01.parquet",
)


def interleave(doc_id: str, text: str) -> list[dict]:
    """Pure-Python mirror of __spark_entry__._interleave_documents
    (byte offsets via UTF-8 octet length, matching F.octet_length)."""
    html_text = NAV + text + FOOTER
    ref = f"img://{doc_id}/0"
    off1 = len(html_text.encode("utf-8")) + 1
    off2 = off1 + len(ref.encode("utf-8")) + 1
    return [
        {"kind": "html", "text": html_text, "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": ref, "offset": off1},
        {"kind": "text", "text": text, "media_ref": "", "offset": off2},
    ]


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xs_vlm_ocr_spark.extract import extract_doc

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else FIXTURE_DEFAULT
    src = os.path.join(sf_dir, "documents.parquet")

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM '{src}' ORDER BY doc_id"
    ).fetchall()

    doc_ids, kinds, texts, refs, orders = [], [], [], [], []
    for doc_id, text in rows:
        if doc_id is None:
            continue  # valid_docs predicate: null ids are routed out
        for s in extract_doc(interleave(doc_id, text)):
            doc_ids.append(doc_id)
            kinds.append(s["kind"])
            texts.append(s["text"])
            refs.append(s["media_ref"])
            orders.append(s["order"])

    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "order": pa.array(orders, pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    with open(src, "rb") as f:
        md5 = hashlib.md5(f.read()).hexdigest()
    # sidecar: input file md5 + the generator's git commit, so a reviewer
    # can see exactly which extractor version produced the expectation
    import subprocess

    try:
        git_hash = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
    except Exception:
        git_hash = "unknown"
    # labeled fields: a positional parse would read the wrong token if
    # the source path ever contains whitespace
    with open(out + ".input_md5", "w") as f:
        f.write(f"md5={md5} src={src} generator_git={git_hash}\n")
    print(f"wrote {len(doc_ids)} expected rows -> {out} "
          f"(input md5 {md5}, generator git {git_hash})")


if __name__ == "__main__":
    main()
