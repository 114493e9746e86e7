"""The fast regex tokenizer and the html.parser implementation must
produce identical segments on the full synthetic corpus and on edge
cases — the tokenizer is the production path, the stdlib parser the
cross-check."""

from xs_vlm_ocr_spark.corpus import gen_doc
from xs_vlm_ocr_spark.extract.html_strip import strip_html, strip_html_stdlib

EDGE_CASES = [
    "<p>fish &amp; chips are genuinely excellent food</p>",
    "<p>an unclosed paragraph with enough characters to keep",
    "",
    "<div>text <!-- a comment --> more text in a long enough div block</div>",
    "<P>UPPERCASE tag paragraph that is long enough to keep</P>",
    "<p>first long enough paragraph</p><p>second long enough paragraph</p>",
    '<ul><li><a href="#">nav</a></li></ul><p>real content paragraph long enough</p>',
    "<br><p>paragraph after a void br element long enough to keep</p><hr>",
    "<!DOCTYPE html><p>doc with doctype and enough characters to keep</p>",
]


def test_edge_case_parity():
    for case in EDGE_CASES:
        assert strip_html(case) == strip_html_stdlib(case), case


def test_corpus_parity():
    checked = 0
    for i in range(300):
        d = gen_doc(f"doc_{i:08d}")
        for s in d["spans"]:
            if s["kind"] == "html":
                assert strip_html(s["text"]) == strip_html_stdlib(s["text"]), d["doc_id"]
                checked += 1
    assert checked > 100
