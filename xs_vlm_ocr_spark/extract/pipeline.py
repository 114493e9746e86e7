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

from typing import Iterable, Mapping, Sequence

from xs_vlm_ocr_spark.extract.html_strip import strip_html
from xs_vlm_ocr_spark.extract.xycut import xycut_paragraphs

Span = Mapping  # kind, text, media_ref, offset
OutSpan = dict  # kind, text, media_ref, order


def _norm(text: str) -> str:
    return " ".join(text.split())


def extract_doc(spans: Sequence[Span]) -> list[OutSpan]:
    """Extract one document's input spans into ordered output spans."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    segments: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
    pdf_run: list[str] = []

    def flush_pdf() -> None:
        if pdf_run:
            for para in xycut_paragraphs(pdf_run):
                segments.append(("text", para, ""))
            pdf_run.clear()

    for span in ordered:
        kind = span["kind"]
        if kind == "pdf_line":
            pdf_run.append(span["text"] or "")
            continue
        flush_pdf()
        if kind == "html":
            for seg in strip_html(span["text"] or ""):
                segments.append(("text", seg, ""))
        elif kind == "text":
            txt = _norm(span["text"] or "")
            if txt:
                segments.append(("text", txt, ""))
        elif kind == "media":
            segments.append(("media", "", span["media_ref"] or ""))
        # unknown kinds are dropped (validity is filtered upstream)
    flush_pdf()

    return [
        {"kind": k, "text": t, "media_ref": m, "order": i}
        for i, (k, t, m) in enumerate(segments)
    ]


def merge_full_text(spans_out: Iterable[OutSpan]) -> str:
    """Join non-empty text spans with newlines.

    Reference analogue: OCRResult::mergeFullText (reference
    src/core/OCRResult.h:33-41).
    """
    return "\n".join(s["text"] for s in spans_out if s["kind"] == "text" and s["text"])
