"""Golden-span fixtures for the pure extraction core (hand-computed
expected outputs — the oracle of the oracle)."""

from xs_vlm_ocr_spark.extract import (
    extract_doc,
    merge_full_text,
    strip_html,
    xycut_paragraphs,
)

HTML_PAGE = """
<html><head><title>t</title><style>.x{color:red}</style></head><body>
<header><h1>site banner</h1></header>
<nav><ul><li><a href="#">Home</a></li><li><a href="#">About us</a></li></ul></nav>
<div id="main">
<h2>Quarterly engine report</h2>
<p>The extraction engine processed many documents this quarter with high accuracy.</p>
<p><a href="#">one</a> <a href="#">two</a></p>
<p>Second paragraph about partitioning and shuffle behavior at large scale.</p>
</div>
<aside><a href="#">x</a> <a href="#">y</a> <a href="#">z</a></aside>
<footer><p>copyright 2026 example corp</p></footer>
</body></html>
"""


def test_strip_html_keeps_main_drops_boilerplate():
    assert strip_html(HTML_PAGE) == [
        "Quarterly engine report",
        "The extraction engine processed many documents this quarter with high accuracy.",
        "Second paragraph about partitioning and shuffle behavior at large scale.",
    ]


def test_strip_html_link_density():
    # long but link-dominated block must be stripped
    links = " ".join(f'<a href="#{i}">navigation link number {i}</a>' for i in range(8))
    assert strip_html(f"<div>{links}</div>") == []
    # same length without links is kept
    plain = " ".join(f"plain content words number {i}" for i in range(8))
    assert strip_html(f"<div>{plain}</div>") == [plain]


def test_strip_html_entities_and_malformed():
    assert strip_html("<p>fish &amp; chips are genuinely excellent food</p>") == [
        "fish & chips are genuinely excellent food"
    ]
    # unclosed tag still flushes at EOF
    assert strip_html("<p>an unclosed paragraph with enough characters to keep") == [
        "an unclosed paragraph with enough characters to keep"
    ]
    assert strip_html("") == []


def _line(x0, y0, x1, y1, txt):
    return f"{x0:.4f},{y0:.4f},{x1:.4f},{y1:.4f}|{txt}"


def test_xycut_two_columns_scanline_input():
    # column A: 0.05-0.45, column B: 0.55-0.95 (gutter 0.10 > X_GAP_MIN)
    spans = [
        _line(0.05, 0.10, 0.45, 0.12, "A one"),
        _line(0.55, 0.10, 0.95, 0.12, "B one"),
        _line(0.05, 0.13, 0.45, 0.15, "A two"),
        _line(0.55, 0.13, 0.95, 0.15, "B two"),
        _line(0.05, 0.20, 0.45, 0.22, "A three"),  # para gap 0.05 > line height
    ]
    assert xycut_paragraphs(spans) == ["A one A two", "A three", "B one B two"]


def test_xycut_title_band_then_columns():
    spans = [
        _line(0.05, 0.02, 0.95, 0.04, "The Title"),
        _line(0.05, 0.12, 0.45, 0.14, "left a"),
        _line(0.55, 0.12, 0.95, 0.14, "right a"),
        _line(0.05, 0.15, 0.45, 0.17, "left b"),
    ]
    assert xycut_paragraphs(spans) == ["The Title", "left a left b", "right a"]


def test_xycut_malformed_lines_dropped():
    assert xycut_paragraphs(["not a line", "1,2|x", ""]) == []
    assert xycut_paragraphs([_line(0.1, 0.1, 0.9, 0.12, "only line")]) == ["only line"]


def test_extract_doc_interleaves_media_by_offset():
    spans = [
        {"kind": "text", "text": "  leading   plain  text block ", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "img://d/0", "offset": 40},
        {"kind": "html", "text": "<p>an html paragraph long enough to keep around</p>", "media_ref": "", "offset": 50},
        {"kind": "media", "text": "", "media_ref": "img://d/1", "offset": 400},
        {"kind": "pdf_line", "text": _line(0.1, 0.1, 0.9, 0.12, "pdf line one"), "media_ref": "", "offset": 500},
        {"kind": "pdf_line", "text": _line(0.1, 0.13, 0.9, 0.15, "pdf line two"), "media_ref": "", "offset": 600},
    ]
    out = extract_doc(spans)
    assert [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in out] == [
        ("text", "leading plain text block", "", 0),
        ("media", "", "img://d/0", 1),
        ("text", "an html paragraph long enough to keep around", "", 2),
        ("media", "", "img://d/1", 3),
        ("text", "pdf line one pdf line two", "", 4),
    ]
    assert merge_full_text(out) == (
        "leading plain text block\n"
        "an html paragraph long enough to keep around\n"
        "pdf line one pdf line two"
    )


def test_extract_doc_unsorted_offsets_are_sorted():
    spans = [
        {"kind": "text", "text": "second block of plain text content", "media_ref": "", "offset": 100},
        {"kind": "text", "text": "first block of plain text content", "media_ref": "", "offset": 0},
    ]
    out = extract_doc(spans)
    assert [s["text"] for s in out] == [
        "first block of plain text content",
        "second block of plain text content",
    ]


def test_pdf_run_split_by_media_anchor():
    # a media span between pdf_line spans splits the run: each run is
    # XY-cut independently and anchored at its first offset
    spans = [
        {"kind": "pdf_line", "text": _line(0.1, 0.10, 0.9, 0.12, "page one"), "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "img://d/0", "offset": 10},
        {"kind": "pdf_line", "text": _line(0.1, 0.10, 0.9, 0.12, "page two"), "media_ref": "", "offset": 20},
    ]
    out = extract_doc(spans)
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in out] == [
        ("text", "page one"),
        ("media", "img://d/0"),
        ("text", "page two"),
    ]
