"""Single-document extraction pipeline + media-span anchoring.

``extract_doc`` is the per-document semantic the whole engine is defined
by: interleaved input spans -> ordered (kind, text, media_ref, order)
output spans. It is the golden oracle AND the function the Spark
``mapInPandas`` stage wraps — never duplicated, so the invariant holds by
construction.

Stages (BASELINE.json:north_star):
  (a) html spans   -> strip_html boilerplate removal -> text segments
  (b) pdf_line runs-> XY-cut reading order + paragraph merge
  (c) anchoring    -> re-interleave extracted text with media spans by
      byte offset (reference analogue: contextId re-association,
      reference src/ui/MainWindow.cpp:1972-1983, and the Gemini
      parts-join, src/adapters/GeminiAdapter.cpp:59-94)

Anchoring rule: every output segment is keyed by (anchor_offset,
segment_index) where anchor_offset is the source span's byte offset (for
a run of consecutive pdf_line spans: the run's first offset). Output
order is the dense rank over that key — explicit, never arrival order
(lesson from the reference's nondeterministic completion ordering,
SURVEY.md §3.2).
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping, Sequence

from xs_vlm_ocr_spark.extract.html_strip import strip_html
from xs_vlm_ocr_spark.extract.xycut import xycut_paragraphs

Span = Mapping  # kind, text, media_ref, offset
OutSpan = dict  # kind, text, media_ref, order

# The engine-wide whitespace contract: one explicit ASCII class, shared
# by every tokenizer/normalizer in BOTH languages (Python here; Spark/
# DuckDB via operators.text_analysis.WS_RE, built from this constant).
# A bare str.split()/\s+ would silently disagree across engines: Python
# str.split also breaks on \x1c-\x1f/\x85/NBSP, Java \s+ includes \x0B
# but RE2 (DuckDB) does not. Pinning the class here makes `_norm` (the
# text-span extraction semantic) expressible JVM-side as
# trim(regexp_replace(text, WS_RE, ' ')) with exact parity — which is
# what lets the Arrow-bypass plan keep plain-text spans out of Python
# entirely (operators.extraction).
WS_CHARS = r" \t\n\r\f\x0b"
_WS = re.compile(f"[{WS_CHARS}]+")


def _norm(text: str) -> str:
    """Collapse pinned-class whitespace runs to single spaces and strip
    the edges. Exactly trim(regexp_replace(text, WS_RE, ' ')) in Spark —
    parity pinned by tests/test_properties.py over every BMP codepoint."""
    return _WS.sub(" ", text).strip(" ")


def extract_doc_arrays(
    kinds: Sequence[str], texts: Sequence[str],
    refs: Sequence[str], offs: Sequence[int],
) -> tuple[list[str], list[str], list[str]]:
    """THE single-doc extraction semantic, over parallel primitive arrays
    (the exact shape Arrow hands the Spark stage) -> (out_kinds,
    out_texts, out_refs). Output index IS the dense `order`.

    This is the allocation-lean hot-loop form: no per-span dicts are
    built in either direction (at 32 workers per socket the per-doc
    CPython allocation traffic is what saturates the memory bus — see
    BENCH/BASELINE.md). ``extract_doc`` is a thin dict adapter over this
    function, so the golden tests pin the same code path the UDF runs.
    The full-text merge is NOT done here: the Spark stage computes it
    JVM-side from o_texts (operators/extraction.py) so the text bytes
    cross the Arrow boundary once, not twice; the pure-Python rule lives
    in ``merge_full_text`` and the two are pinned equal by
    tests/test_end_to_end.py::test_golden_span_equality.
    """
    order = sorted(range(len(kinds)), key=offs.__getitem__)
    out_kinds: list[str] = []
    out_texts: list[str] = []
    out_refs: list[str] = []
    k_app, t_app, r_app = out_kinds.append, out_texts.append, out_refs.append
    pdf_run: list[str] = []

    def flush_pdf() -> None:
        if pdf_run:
            for para in xycut_paragraphs(pdf_run):
                k_app("text"); t_app(para); r_app("")  # noqa: E702
            pdf_run.clear()

    for i in order:
        kind = kinds[i]
        if kind == "pdf_line":
            pdf_run.append(texts[i] or "")
            continue
        flush_pdf()
        if kind == "html":
            for seg in strip_html(texts[i] or ""):
                k_app("text"); t_app(seg); r_app("")  # noqa: E702
        elif kind == "text":
            txt = _norm(texts[i] or "")
            if txt:
                k_app("text"); t_app(txt); r_app("")  # noqa: E702
        elif kind == "media":
            k_app("media"); t_app(""); r_app(refs[i] or "")  # noqa: E702
        # unknown kinds are dropped (validity is filtered upstream)
    flush_pdf()
    return out_kinds, out_texts, out_refs


def extract_doc(spans: Sequence[Span]) -> list[OutSpan]:
    """Extract one document's input spans into ordered output spans
    (dict-span adapter over ``extract_doc_arrays`` — one implementation,
    two calling conventions)."""
    out_kinds, out_texts, out_refs = extract_doc_arrays(
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        [s["offset"] for s in spans],
    )
    return [
        {"kind": k, "text": t, "media_ref": m, "order": i}
        for i, (k, t, m) in enumerate(zip(out_kinds, out_texts, out_refs))
    ]


# the Spark stage dispatches to the arrays form when the registered
# strategy provides one (operators.extraction.extract_spans)
extract_doc.arrays_impl = extract_doc_arrays


def merge_full_text(spans_out: Iterable[OutSpan]) -> str:
    """Join non-empty text spans with newlines.

    Reference analogue: OCRResult::mergeFullText (reference
    src/core/OCRResult.h:33-41).
    """
    return "\n".join(s["text"] for s in spans_out if s["kind"] == "text" and s["text"])
