"""Tamper-evidence guard for the flagship oracle fixture.

The driver's `extract_flagship` oracle compares the Spark pipeline
against a COMMITTED parquet fixture (fixtures/flagship_expected_sf0.01
.parquet), which is regenerated ONLY by an explicit
`python tools/make_flagship_fixture.py` run — never inside the contract.
That leaves two failure modes this test pins down, pure-Python (no
Spark), before any driver run:

  1. FRESHNESS: a semantic change to xs_vlm_ocr_spark/extract/ (or a
     driver-regenerated sf0.01 input) makes the committed fixture stale.
     Recomputing the expectation here and demanding byte-equality means
     such a change fails THIS test with a message pointing at the regen
     tool — instead of surfacing as a confusing oracle hash mismatch.
  2. SENSITIVITY (non-vacuity): a deliberately perturbed extractor must
     produce rows that differ from the fixture — proving the oracle
     compare has teeth and does not re-derive its own expectation.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "flagship_expected_sf0.01.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _input_rows():
    import duckdb

    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT CAST(doc_id AS VARCHAR), text "
            f"FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    finally:
        con.close()


def _expected_rows(extract_fn):
    from tools.make_flagship_fixture import interleave

    rows = []
    for doc_id, text in _input_rows():
        if doc_id is None:
            continue
        for s in extract_fn(interleave(doc_id, text)):
            rows.append((doc_id, s["kind"], s["text"], s["media_ref"], s["order"]))
    return sorted(rows)  # value-set compare; row order is not part of the oracle


def _fixture_rows():
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    return sorted(zip(*(t.column(c).to_pylist()
                        for c in ("doc_id", "kind", "text", "media_ref", "order"))))


def test_fixture_is_fresh_against_pure_extractor():
    """Committed fixture == current pure-Python extractor output. Fails
    loudly (with the regen command) if extract/ semantics or the driver
    input changed without an explicit fixture regeneration."""
    from xs_vlm_ocr_spark.extract import extract_doc

    assert os.path.exists(FIXTURE), (
        f"missing oracle fixture; run: python tools/make_flagship_fixture.py "
        f"{SF_DIR} {FIXTURE}"
    )
    expected = _expected_rows(extract_doc)
    committed = _fixture_rows()
    assert committed == expected, (
        "flagship oracle fixture is STALE: the pure-Python extractor no "
        "longer reproduces it. If the extract/ change is intentional, "
        f"regenerate explicitly: python tools/make_flagship_fixture.py "
        f"{SF_DIR} {FIXTURE}"
    )


def test_fixture_compare_is_sensitive_to_extractor_changes():
    """Non-vacuity: a one-token semantic perturbation of the extractor
    (dropping its first output span per doc) must diverge from the
    fixture — i.e. the oracle would catch a regression in extract/."""
    from xs_vlm_ocr_spark.extract import extract_doc

    def perturbed(spans):
        out = extract_doc(spans)[1:]  # drop the first span
        return [{**s, "order": i} for i, s in enumerate(out)]

    assert _expected_rows(perturbed) != _fixture_rows()
